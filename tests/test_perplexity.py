import math

import numpy as np

import jax.numpy as jnp

from tests.test_llama import CFG, make_weights, to_params, oracle_cfg
from tests import reference_impl as ref
from tpu_llm.config import LlamaConfig
from tpu_llm.runtime.engine import ModelAdapter
from tpu_llm.runtime.perplexity import compute_ppl


def test_ppl_matches_oracle_nll():
    w = make_weights(6)
    params = to_params(w)
    cfg = LlamaConfig(**CFG, rope_variant="llmf90")
    adapter = ModelAdapter.llama(cfg, bos_id=1)

    ids = [5, 9, 33, 7, 2, 41]
    res = compute_ppl(params, adapter, ids, window=16, add_bos=True)

    # oracle: teacher-forced NLL with full-sequence context
    oracle = ref.RefLlama(w, oracle_cfg(), rope="llmf90")
    seq = [1] + ids
    nll = 0.0
    for pos in range(len(seq) - 1):
        logits = oracle.step(seq[pos], pos).astype(np.float64)
        logp = logits - (np.log(np.sum(np.exp(logits - logits.max()))) + logits.max())
        nll -= logp[seq[pos + 1]]
    expected = math.exp(nll / (len(seq) - 1))
    assert res.n_tokens == len(seq) - 1
    np.testing.assert_allclose(res.ppl, expected, rtol=2e-3)


def test_ppl_windowing_consistent():
    w = make_weights(7)
    params = to_params(w)
    cfg = LlamaConfig(**CFG)
    adapter = ModelAdapter.llama(cfg, bos_id=1)
    ids = list(np.random.default_rng(0).integers(0, CFG["vocab_size"], 13))

    r1 = compute_ppl(params, adapter, ids, window=14)
    assert r1.ppl > 0 and np.isfinite(r1.ppl)
    # windows restart context, so smaller windows give a (generally
    # different) finite value with the same token count accounting
    r2 = compute_ppl(params, adapter, ids, window=7)
    assert np.isfinite(r2.ppl)
    assert r1.n_tokens == len(ids)  # bos adds 1, last unscored: 13+1-1


def test_fold_norms_ppl_delta_bounded():
    """--fold-norms evidence: the requantization rounding moves ppl by
    well under the quantization kind's own error band (the fold is a
    perf option, not a numerics change users should notice)."""
    from tpu_llm.quant.convert_params import (fold_norms_requant,
                                              quantize_llama_params)

    cfg = LlamaConfig(**CFG)
    adapter = ModelAdapter.llama(cfg, bos_id=1)
    ids = [5, 9, 33, 7, 2, 41, 12, 8, 3, 19]

    qparams = quantize_llama_params(
        to_params(make_weights(6)), "q8_0", layer_keys=("wq", "wk", "wv"))
    base = compute_ppl(qparams, adapter, ids, window=16, add_bos=True)
    folded = fold_norms_requant(qparams, cfg)
    got = compute_ppl(folded, adapter, ids, window=16, add_bos=True)
    assert abs(math.log(got.ppl) - math.log(base.ppl)) < 0.05, \
        (base.ppl, got.ppl)
