"""On-chip A/B for the coalesced-DMA paged decode fast path
(TPU_LLM_PAGED_COALESCE): the r5 identical-harness gap attribution
(r5_paged_int8_gap.py) pinned the paged kernels' loss vs dense to the
scattered per-pool-block DMAs at deep positions; this measures whether
replacing them with ONE (cb, bs, kvd) copy for contiguous table runs
(the allocator's common case — and exactly this harness's tables)
closes the gap. Reuses the identical slope-timed harness.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from r5_paged_int8_gap import paged_tok_s  # noqa: E402  (shares harness)
from tpu_llm.config import tinyllama_1_1b  # noqa: E402
from tpu_llm.runtime.bench_cli import _build  # noqa: E402


def emit(**row):
    print(json.dumps(row), flush=True)


def main():
    cfg = tinyllama_1_1b()
    params = _build("q4_0")
    # argv: case specs "int8:32:1" (kind:block_size:coalesce). Default
    # sweep kept short — each config is a fresh ~15-min remote compile
    # through the tunnel. coalesce=False baselines reproduce the
    # r5_paged_int8_gap rows (bs32 int8 re-measured 7743.7 vs 7754).
    specs = sys.argv[1:] or ["int8:32:0", "int8:32:1", "int8:64:1",
                             "bf16:32:1"]
    for spec in specs:
        label, bs, coalesce = spec.split(":")
        bs, coalesce = int(bs), bool(int(coalesce))
        if coalesce:
            os.environ["TPU_LLM_PAGED_COALESCE"] = "1"
        else:
            os.environ.pop("TPU_LLM_PAGED_COALESCE", None)
        tok_s = paged_tok_s(params, cfg, label == "int8", bs)
        emit(config=f"paged_{label}_bs{bs}",
             coalesce=coalesce, tok_s=round(tok_s, 1))


if __name__ == "__main__":
    main()
