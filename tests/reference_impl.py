"""Independent numpy oracle reproducing the REFERENCE's numerics.

This is a clean-room reimplementation of the math described in SURVEY.md
§2/§3 (eps-inside-mean RMSNorm, the Fortran's 1-based odd-exponent RoPE,
truncation softmax, intended GQA mapping, SwiGLU, selective scan) used to
pin the JAX implementation's parity. Deliberately slow/obvious numpy —
no JAX imports.
"""

from __future__ import annotations

import numpy as np


def rmsnorm(x, w, eps=1e-5):
    return x * w / np.sqrt(np.mean(x * x) + eps)


def softmax_trunc(x, n):
    p = np.zeros_like(x)
    xi = np.exp(x[:n] - np.max(x[:n]))
    p[:n] = xi / xi.sum()
    return p


def rope_llmf90(vec, pos0, head_size, theta=10000.0):
    """The Fortran inline loop (llama2.f90:543-559) on a flat vector:
    1-based dims i=1,3,5..., exponent mod(i, head_size), angle (pos0+1)*freq."""
    v = vec.astype(np.float64).copy()
    for i in range(1, len(v), 2):  # 1-based odd i
        head_dim = i % head_size
        freq = 1.0 / (theta ** (head_dim / head_size))
        ang = (pos0 + 1) * freq
        c, s = np.cos(ang), np.sin(ang)
        x0, x1 = v[i - 1], v[i]
        v[i - 1] = x0 * c - x1 * s
        v[i] = x0 * s + x1 * c
    return v.astype(vec.dtype)


def rope_interleaved(vec, pos0, head_size, theta=10000.0):
    """llama2.c-correct interleaved rope on a flat vector."""
    v = vec.astype(np.float64).copy()
    for i in range(0, len(v), 2):
        head_dim = i % head_size
        freq = 1.0 / (theta ** (head_dim / head_size))
        ang = pos0 * freq
        c, s = np.cos(ang), np.sin(ang)
        x0, x1 = v[i], v[i + 1]
        v[i] = x0 * c - x1 * s
        v[i + 1] = x0 * s + x1 * c
    return v.astype(vec.dtype)


class RefLlama:
    """Single-stream decode exactly following transformer() (llama2.f90:480-
    640), with the GQA mapping the code intends (kv head = h // kv_mul)."""

    def __init__(self, weights, cfg, rope="llmf90"):
        # weights: dict of numpy arrays in (out, in) orientation like the
        # Fortran column layout: wq[l] is (dim, dim) applied as W @ x
        self.w = weights
        self.cfg = cfg
        self.rope = rope
        L = cfg["n_layers"]
        S = cfg["seq_len"]
        self.key_cache = np.zeros((L, S, cfg["kv_dim"]), np.float32)
        self.value_cache = np.zeros((L, S, cfg["kv_dim"]), np.float32)

    def step(self, token, pos0):
        cfg, w = self.cfg, self.w
        dim, hs = cfg["dim"], cfg["dim"] // cfg["n_heads"]
        kv_mul = cfg["n_heads"] // cfg["n_kv_heads"]
        rope_fn = rope_llmf90 if self.rope == "llmf90" else rope_interleaved

        x = w["tok_emb"][token].astype(np.float32).copy()
        for l in range(cfg["n_layers"]):
            xb = rmsnorm(x, w["attn_norm"][l])
            q = w["wq"][l] @ xb
            k = w["wk"][l] @ xb
            v = w["wv"][l] @ xb
            q = rope_fn(q, pos0, hs)
            k = rope_fn(k, pos0, hs)
            self.key_cache[l, pos0] = k
            self.value_cache[l, pos0] = v

            xo = np.zeros(dim, np.float32)
            for h in range(cfg["n_heads"]):
                qh = q[h * hs : (h + 1) * hs]
                kvh = h // kv_mul
                scores = np.zeros(cfg["seq_len"], np.float32)
                for t in range(pos0 + 1):
                    kt = self.key_cache[l, t, kvh * hs : (kvh + 1) * hs]
                    scores[t] = qh @ kt / np.sqrt(hs)
                att = softmax_trunc(scores, pos0 + 1)
                out = np.zeros(hs, np.float32)
                for t in range(pos0 + 1):
                    vt = self.value_cache[l, t, kvh * hs : (kvh + 1) * hs]
                    out += att[t] * vt
                xo[h * hs : (h + 1) * hs] = out

            x = x + w["wo"][l] @ xo
            xb = rmsnorm(x, w["ffn_norm"][l])
            hb = w["w1"][l] @ xb
            hb2 = w["w3"][l] @ xb
            hb = hb * (1.0 / (1.0 + np.exp(-hb)))
            hb = hb * hb2
            x = x + w["w2"][l] @ hb

        x = rmsnorm(x, w["final_norm"])
        return w["wcls"] @ x  # (vocab,)


def ref_mamba_step(token, hidden_prev, weights, cfg, conv_state, ssm_state):
    """One Mamba decode step following next_token()/mamba()
    (ssm/mamba.f90:511-665)."""
    w = weights
    d_inner, d_state = cfg["d_inner"], cfg["d_state"]
    dt_rank, d_conv = cfg["dt_rank"], cfg["d_conv"]

    hidden = w["tok_emb"][token].astype(np.float32).copy()
    residual = np.zeros_like(hidden)
    for l in range(cfg["n_layers"]):
        xb = rmsnorm(hidden + residual, w["norm"][l])
        residual = hidden + residual
        # mixer
        xz = xb @ w["in_proj"][l]          # (2*d_inner,)
        x, z = xz[:d_inner], xz[d_inner:]
        conv_state[l, :-1] = conv_state[l, 1:]
        conv_state[l, -1] = x
        x = (conv_state[l] * w["conv1d"][l]).sum(0) + w["conv1d_bias"][l]
        x = x / (1.0 + np.exp(-x))
        x_db = x @ w["x_proj"][l]
        dt = x_db[:dt_rank]
        B = x_db[dt_rank : dt_rank + d_state]
        C = x_db[dt_rank + d_state :]
        dt = dt @ w["dt_proj"][l]
        A = -np.exp(w["A_log"][l])          # (d_state, d_inner)
        dt = np.log1p(np.exp(dt + w["dt_proj_bias"][l]))
        dA = np.exp(dt[None, :] * A)
        dB = dt[None, :] * B[:, None]
        ssm_state[l] = ssm_state[l] * dA + x[None, :] * dB
        y = (ssm_state[l] * C[:, None]).sum(0)
        y = y + w["D"][l] * x
        y = y * (z / (1.0 + np.exp(-z)))
        hidden = y @ w["out_proj"][l]

    hidden = rmsnorm(hidden + residual, w["norm_f"])
    return hidden @ w["wcls"], hidden


def layernorm(x, w, b, eps=1e-5):
    mu = x.mean()
    var = ((x - mu) ** 2).mean()
    return (x - mu) / np.sqrt(var + eps) * w + b


def gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def rope_neox_head(head, pos0, rot, theta=10000.0):
    """NeoX half-rotation on one head vector; dims >= rot pass through."""
    v = head.astype(np.float64).copy()
    half = rot // 2
    for j in range(half):
        freq = 1.0 / (theta ** (2.0 * j / rot))
        ang = pos0 * freq
        c, s = np.cos(ang), np.sin(ang)
        x0, x1 = v[j], v[j + half]
        v[j] = x0 * c - x1 * s
        v[j + half] = x0 * s + x1 * c
    return v.astype(head.dtype)


class RefPhi2:
    """Single-stream phi-2-style decode: parallel attn+MLP block sharing
    one LayerNorm, biases, partial NeoX rope, tanh-GELU MLP."""

    def __init__(self, weights, cfg):
        self.w = weights  # (out, in) orientation
        self.cfg = cfg
        L, S = cfg["n_layers"], cfg["seq_len"]
        self.key_cache = np.zeros((L, S, cfg["dim"]), np.float32)
        self.value_cache = np.zeros((L, S, cfg["dim"]), np.float32)

    def step(self, token, pos0):
        cfg, w = self.cfg, self.w
        dim, H = cfg["dim"], cfg["n_heads"]
        hs, rot = dim // H, cfg["rope_dims"]

        x = w["tok_emb"][token].astype(np.float32).copy()
        for l in range(cfg["n_layers"]):
            h = layernorm(x, w["attn_norm"][l], w["attn_norm_b"][l])
            q = w["wq"][l] @ h + w["bq"][l]
            k = w["wk"][l] @ h + w["bk"][l]
            v = w["wv"][l] @ h + w["bv"][l]
            for hd in range(H):
                sl = slice(hd * hs, (hd + 1) * hs)
                q[sl] = rope_neox_head(q[sl], pos0, rot)
                k[sl] = rope_neox_head(k[sl], pos0, rot)
            self.key_cache[l, pos0] = k
            self.value_cache[l, pos0] = v

            att_out = np.zeros(dim, np.float32)
            for hd in range(H):
                sl = slice(hd * hs, (hd + 1) * hs)
                scores = np.zeros(pos0 + 1, np.float32)
                for t in range(pos0 + 1):
                    scores[t] = q[sl] @ self.key_cache[l, t, sl] / np.sqrt(hs)
                scores = np.exp(scores - scores.max())
                scores /= scores.sum()
                for t in range(pos0 + 1):
                    att_out[sl] += scores[t] * self.value_cache[l, t, sl]
            attn = w["wo"][l] @ att_out + w["bo"][l]

            mlp = w["w2"][l] @ gelu_tanh(w["w3"][l] @ h + w["b3"][l]) + w["b2"][l]
            x = x + attn + mlp

        x = layernorm(x, w["final_norm"], w["final_norm_b"])
        return w["wcls"] @ x + w["bcls"]
