import numpy as np

import jax
import jax.numpy as jnp

from tests import reference_impl as ref
from tpu_llm.config import MambaConfig
from tpu_llm.io.mamba_ckpt import read_packed, write_packed
from tpu_llm.models import mamba as M
from tpu_llm.runtime.engine import Engine, ModelAdapter

CFG = MambaConfig(d_model=32, n_layers=2, vocab_size=64)


def make_torch_arrays(seed=0):
    """Random weights in TORCH orientation (what write_packed expects)."""
    rng = np.random.default_rng(seed)
    dm, di, ds, dr, dc = (CFG.d_model, CFG.d_inner, CFG.d_state,
                          CFG.dt_rank_, CFG.d_conv)
    L, V = CFG.n_layers, CFG.vocab_size
    s = lambda *sh: (rng.standard_normal(sh) * 0.1).astype(np.float32)
    return {
        "tok_emb": s(V, dm),
        "norm_f": 1.0 + 0.1 * s(dm),
        "wcls": s(V, dm),
        "D": s(L, di),
        "in_proj": s(L, 2 * di, dm),
        "conv_w": s(L, di, dc),
        "conv_b": s(L, di),
        "x_proj": s(L, dr + 2 * ds, di),
        "dt_proj": s(L, di, dr),
        "dt_bias": s(L, di),
        "A_log": np.abs(s(L, di, ds)) + 0.1,
        "out_proj": s(L, dm, di),
        "norm": 1.0 + 0.1 * s(L, dm),
    }


def to_oracle_weights(a):
    """Torch orientation -> the math orientation the numpy oracle uses."""
    t = lambda x: np.ascontiguousarray(x.transpose(0, 2, 1))
    return {
        "tok_emb": a["tok_emb"],
        "norm_f": a["norm_f"],
        "wcls": a["wcls"].T.copy(),
        "D": a["D"],
        "in_proj": t(a["in_proj"]),
        "conv1d": t(a["conv_w"]),
        "conv1d_bias": a["conv_b"],
        "x_proj": t(a["x_proj"]),
        "dt_proj": t(a["dt_proj"]),
        "dt_proj_bias": a["dt_bias"],
        "A_log": t(a["A_log"]),
        "out_proj": t(a["out_proj"]),
        "norm": a["norm"],
    }


def oracle_cfg():
    return dict(n_layers=CFG.n_layers, d_inner=CFG.d_inner, d_state=CFG.d_state,
                dt_rank=CFG.dt_rank_, d_conv=CFG.d_conv)


def test_packed_roundtrip(tmp_path):
    path = str(tmp_path / "mamba.bin")
    arrays = make_torch_arrays()
    write_packed(path, arrays, CFG)
    params, cfg = read_packed(path)
    assert cfg.d_model == CFG.d_model and cfg.n_layers == CFG.n_layers
    np.testing.assert_allclose(np.asarray(params["tok_emb"]), arrays["tok_emb"])
    np.testing.assert_allclose(
        np.asarray(params["layers"]["in_proj"][0]), arrays["in_proj"][0].T
    )


def test_decode_matches_fortran_oracle(tmp_path):
    path = str(tmp_path / "mamba.bin")
    arrays = make_torch_arrays(1)
    write_packed(path, arrays, CFG)
    params, cfg = read_packed(path)

    ow = to_oracle_weights(arrays)
    ocfg = oracle_cfg()
    conv_state = np.zeros((CFG.n_layers, CFG.d_conv, CFG.d_inner), np.float32)
    ssm_state = np.zeros((CFG.n_layers, CFG.d_state, CFG.d_inner), np.float32)

    state = M.init_state(cfg, batch=1)
    for pos, tok in enumerate([3, 17, 5, 60]):
        hidden, state = M.forward(
            params, cfg, jnp.asarray([[tok]], jnp.int32), state
        )
        logits = np.asarray(M.lm_head(params, cfg, hidden))[0, 0]
        expected, _ = ref.ref_mamba_step(tok, None, ow, ocfg, conv_state, ssm_state)
        np.testing.assert_allclose(
            logits, expected, rtol=3e-4, atol=3e-4, err_msg=f"pos {pos}"
        )


def test_prefill_equals_stepwise():
    arrays = make_torch_arrays(2)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.bin")
        write_packed(path, arrays, CFG)
        params, cfg = read_packed(path)

    tokens = [7, 2, 41, 13]
    # stepwise
    state1 = M.init_state(cfg, 1)
    hs = []
    for tok in tokens:
        h, state1 = M.forward(params, cfg, jnp.asarray([[tok]], jnp.int32), state1)
        hs.append(np.asarray(h)[0, 0])
    # one scan pass
    state2 = M.init_state(cfg, 1)
    h_all, state2 = M.forward(params, cfg, jnp.asarray([tokens], jnp.int32), state2)
    np.testing.assert_allclose(
        np.asarray(h_all)[0], np.stack(hs), rtol=2e-4, atol=2e-4
    )
    for k in ("conv", "ssm"):
        np.testing.assert_allclose(
            np.asarray(state1[k]), np.asarray(state2[k]), rtol=2e-4, atol=2e-4
        )


def test_prefill_padding_masked():
    """Right-padded prefill with length mask must leave the state exactly
    where the unpadded prefill leaves it (recurrent state is corruptible
    by padding, unlike the KV cache)."""
    arrays = make_torch_arrays(3)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.bin")
        write_packed(path, arrays, CFG)
        params, cfg = read_packed(path)

    tokens = [5, 9, 30]
    state1 = M.init_state(cfg, 1)
    _, state1 = M.forward(params, cfg, jnp.asarray([tokens], jnp.int32), state1)

    padded = tokens + [0] * 5
    state2 = M.init_state(cfg, 1)
    _, state2 = M.forward(
        params, cfg, jnp.asarray([padded], jnp.int32), state2,
        length=jnp.int32(3),
    )
    for k in ("conv", "ssm"):
        np.testing.assert_allclose(
            np.asarray(state1[k]), np.asarray(state2[k]), rtol=1e-5, atol=1e-6
        )


def test_parallel_scan_equals_sequential():
    """The associative-scan prefill must match the exact step recurrence,
    including when resuming from a nonzero carried-in state (chunked
    prefill) and with right-padding masked by `length`."""
    arrays = make_torch_arrays(5)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.bin")
        write_packed(path, arrays, CFG)
        params, cfg = read_packed(path)

    rng = np.random.default_rng(0)
    chunk1 = rng.integers(0, CFG.vocab_size, (2, 5))
    chunk2 = rng.integers(0, CFG.vocab_size, (2, 6))

    # sequential oracle over both chunks
    st_seq = M.init_state(cfg, 2)
    h1s, st_seq = M.forward(
        params, cfg, jnp.asarray(chunk1, jnp.int32), st_seq, sequential=True
    )
    h2s, st_seq = M.forward(
        params, cfg, jnp.asarray(chunk2, jnp.int32), st_seq, sequential=True
    )

    # parallel path, second chunk resumes from the first chunk's state
    st_par = M.init_state(cfg, 2)
    h1p, st_par = M.forward(params, cfg, jnp.asarray(chunk1, jnp.int32), st_par)
    h2p, st_par = M.forward(params, cfg, jnp.asarray(chunk2, jnp.int32), st_par)

    np.testing.assert_allclose(np.asarray(h1p), np.asarray(h1s), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h2p), np.asarray(h2s), rtol=2e-4, atol=2e-4)
    for k in ("conv", "ssm"):
        np.testing.assert_allclose(
            np.asarray(st_par[k]), np.asarray(st_seq[k]), rtol=2e-4, atol=2e-4
        )

    # length-masked padding: parallel state must freeze at t >= length
    padded = np.concatenate([chunk1, np.zeros((2, 7), np.int64)], axis=1)
    st_ref = M.init_state(cfg, 2)
    _, st_ref = M.forward(params, cfg, jnp.asarray(chunk1, jnp.int32), st_ref)
    st_pad = M.init_state(cfg, 2)
    _, st_pad = M.forward(
        params, cfg, jnp.asarray(padded, jnp.int32), st_pad,
        length=jnp.int32(chunk1.shape[1]),
    )
    for k in ("conv", "ssm"):
        np.testing.assert_allclose(
            np.asarray(st_pad[k]), np.asarray(st_ref[k]), rtol=1e-5, atol=1e-6
        )


def test_engine_mamba_generation():
    arrays = make_torch_arrays(4)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.bin")
        write_packed(path, arrays, CFG)
        params, cfg = read_packed(path)

    adapter = ModelAdapter.mamba(cfg)
    engine = Engine(params, adapter, max_seq=32)
    res = engine.generate([3, 7], n_total=8, temperature=0.0, seed=0, add_bos=False)
    assert len(res.tokens) == 8
    assert res.tokens[:2] == [3, 7]

    # oracle greedy: teacher-force the prompt once each (the engine's
    # semantics — NOT the reference's latent double-feed of the first
    # prompt token, ssm/mamba.f90:406 + the pos<=P reassignment), then
    # feed back samples
    ow = to_oracle_weights(arrays)
    ocfg = oracle_cfg()
    conv = np.zeros((CFG.n_layers, CFG.d_conv, CFG.d_inner), np.float32)
    ssm = np.zeros((CFG.n_layers, CFG.d_state, CFG.d_inner), np.float32)
    seq = [3, 7]
    emitted = list(seq)
    token = seq[0]
    pos = 0
    while len(emitted) < 8:
        logits, _ = ref.ref_mamba_step(token, None, ow, ocfg, conv, ssm)
        pos += 1
        if pos < len(seq):
            token = seq[pos]
        else:
            token = int(np.argmax(logits))
            emitted.append(token)
    assert res.tokens == emitted


def test_unstacked_matches_stacked():
    """Unstacked (python layer loop) decode and prefill numerics equal the
    stacked lax.scan path exactly."""
    arrays = make_torch_arrays(4)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.bin")
        write_packed(path, arrays, CFG)
        params, cfg = read_packed(path)

    pu = M.unstack_layers(params)
    tokens = jnp.asarray([[7, 2, 41, 13]], jnp.int32)

    # prefill (time-parallel path)
    h_s, st_s = M.forward(params, cfg, tokens, M.init_state(cfg, 1))
    h_u, st_u = M.forward(pu, cfg, tokens, M.init_state(cfg, 1, stacked=False))
    np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_u),
                               rtol=1e-6, atol=1e-6)
    for k in ("conv", "ssm"):
        np.testing.assert_allclose(
            np.asarray(st_s[k]), np.stack([np.asarray(x) for x in st_u[k]]),
            rtol=1e-6, atol=1e-6)

    # decode step from those states
    nxt = jnp.asarray([[9]], jnp.int32)
    h_s2, _ = M.forward(params, cfg, nxt, st_s)
    h_u2, _ = M.forward(pu, cfg, nxt, st_u)
    np.testing.assert_allclose(np.asarray(h_s2), np.asarray(h_u2),
                               rtol=1e-6, atol=1e-6)


def test_split_projections_exact_parity():
    """split_projections only re-tiles matmuls (each output column is an
    independent dot product), so outputs agree to f32 ULP noise — XLA
    may pick different contraction tilings for the narrower shapes."""
    import jax.numpy as jnp

    from tpu_llm.models import mamba as M
    from tpu_llm.runtime.bench_cli import _build_mamba

    params, cfg = _build_mamba()
    sp = M.split_projections(M.unstack_layers(params))
    assert "in_proj_x" in sp["layers"][0] and "xp_c" in sp["layers"][0]
    # idempotent / pass-through on already-split params
    assert M.split_projections(sp) is sp or "in_proj_x" in \
        M.split_projections(sp)["layers"][0]

    # like-for-like: unstacked fused vs unstacked split (only the weight
    # layout differs — each output column is an independent dot product)
    toks = jnp.asarray([[5, 9, 3]], jnp.int32)
    un = M.unstack_layers(params)
    h_a, st_a = M.forward(un, cfg, toks, M.init_state(cfg, 1, stacked=False))
    h_b, st_b = M.forward(sp, cfg, toks, M.init_state(cfg, 1, stacked=False))
    np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_a["ssm"][2]),
                               np.asarray(st_b["ssm"][2]),
                               rtol=1e-5, atol=1e-6)

    # stacked split (scan path) vs stacked fused also exact
    h_c, _ = M.forward(params, cfg, toks, M.init_state(cfg, 1))
    h_d, _ = M.forward(M.split_projections(params), cfg, toks,
                       M.init_state(cfg, 1))
    np.testing.assert_allclose(np.asarray(h_c), np.asarray(h_d),
                               rtol=1e-5, atol=1e-6)

    # decode step (T=1) parity through the sequential path
    h_e, _ = M.forward(un, cfg, toks[:, :1],
                       M.init_state(cfg, 1, stacked=False))
    h_f, _ = M.forward(sp, cfg, toks[:, :1],
                       M.init_state(cfg, 1, stacked=False))
    np.testing.assert_allclose(np.asarray(h_e), np.asarray(h_f),
                               rtol=1e-5, atol=1e-6)
