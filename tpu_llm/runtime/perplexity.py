"""Perplexity evaluation harness.

The reference has no ppl tool (validation was eyeballing generations,
SURVEY.md §4); BASELINE.json makes "ppl Δ vs reference at each bit width"
a first-class metric, so this provides it: teacher-forced NLL of a token
stream under any ModelAdapter, windowed to the model's max context.

ppl = exp(mean over positions of -log p(token_{t+1} | tokens_<=t)).
The first token of each window is never scored (no context).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_llm.runtime.engine import ModelAdapter


@dataclasses.dataclass
class PplResult:
    ppl: float
    nll_sum: float
    n_tokens: int

    @property
    def mean_nll(self) -> float:
        return self.nll_sum / max(self.n_tokens, 1)


def compute_ppl(
    params: Any,
    adapter: ModelAdapter,
    ids: Sequence[int],
    window: int = 512,
    add_bos: bool = True,
) -> PplResult:
    """Windowed (non-overlapping) teacher-forced perplexity."""
    ids = list(ids)
    if add_bos and adapter.bos_id >= 0:
        ids = [adapter.bos_id] + ids
    if len(ids) < 2:
        raise ValueError("need at least 2 tokens to score")

    @jax.jit
    def window_nll(params, tokens, state, n_valid):
        # tokens (1, W); score predictions for positions 1..n_valid-1
        hidden, state = adapter.apply(
            params, tokens=tokens, state=state, offset=jnp.int32(0),
            length=n_valid,
        )
        logits = adapter.lm_head(params, hidden=hidden)  # (1, W, V)
        logp = jax.nn.log_softmax(logits[:, :-1, :], axis=-1)
        targets = tokens[:, 1:]
        tok_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        idx = jnp.arange(tokens.shape[1] - 1)
        mask = idx < (n_valid - 1)
        return -jnp.sum(jnp.where(mask, tok_logp[0], 0.0)), jnp.sum(mask)

    nll_sum, count = 0.0, 0
    pos = 0
    while pos + 1 < len(ids):
        chunk = ids[pos : pos + window]
        n_valid = len(chunk)
        padded = chunk + [0] * (window - n_valid)
        state = adapter.init_state(1, window)
        nll, n = window_nll(
            params, jnp.asarray([padded], jnp.int32), state, jnp.int32(n_valid)
        )
        nll_sum += float(nll)
        count += int(n)
        pos += n_valid  # non-overlapping windows; last token of a window
        # re-scored as first (unscored) token of the next — windows restart
        # context, matching llama.cpp-style chunked ppl
        if n_valid < window:
            break

    return PplResult(ppl=math.exp(nll_sum / count), nll_sum=nll_sum, n_tokens=count)


def main(argv: Optional[List[str]] = None) -> int:
    import argparse
    import sys

    p = argparse.ArgumentParser(
        prog="llm-ppl", description="perplexity of a text file under a GGUF model"
    )
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-f", "--file", required=True, help="UTF-8 text file")
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16", "native"])
    p.add_argument("--window", type=int, default=512)
    p.add_argument("--max-tokens", type=int, default=0, help="truncate input")
    args = p.parse_args(argv)

    from tpu_llm.io.gguf import GGUFFile
    from tpu_llm.tokenizers.bpe import BPETokenizer

    gguf = GGUFFile(args.model)
    arch = gguf.hparam("general.architecture", default="llama")
    if arch == "phi2":
        from tpu_llm.models.phi2 import load_gguf
    else:
        from tpu_llm.models.llama import load_gguf
    params, cfg = load_gguf(gguf, dtype_policy=args.dtype)
    tokenizer = BPETokenizer.from_gguf(gguf)

    with open(args.file, "rb") as fh:
        text = fh.read().decode("utf-8", errors="replace")
    ids = tokenizer.encode(text)
    if args.max_tokens:
        ids = ids[: args.max_tokens]

    adapter = ModelAdapter.llama(cfg, bos_id=tokenizer.bos_id)
    res = compute_ppl(params, adapter, ids, window=min(args.window, cfg.seq_len))
    print(f"ppl = {res.ppl:.4f} over {res.n_tokens} tokens "
          f"(mean nll {res.mean_nll:.4f})")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
