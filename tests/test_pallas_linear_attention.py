"""Fused linear-attention kernel: numerics vs the plain-XLA oracle (which
the torch-parity matrix pins against the reference), mask correctness for
non-divisible N, and param-tree compatibility of the rewired module."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calodiffusion_tpu.ops.pallas_linear_attention import (
    attention_block_reference,
    fused_attention_block,
    fused_linear_attention,
    in_training_trace,
    linear_attention_reference,
    training_trace,
)


def _inputs(B, N, C, D=32, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(ks[0], (B, N, C), dtype)
    w_qkv = jax.random.normal(ks[1], (C, 3 * D), dtype) * 0.2
    w_out = jax.random.normal(ks[2], (D, C), dtype) * 0.2
    b_out = jax.random.normal(ks[3], (C,), jnp.float32) * 0.1
    return x, w_qkv, w_out, b_out


@pytest.mark.parametrize("C", [32, 64])
@pytest.mark.parametrize("N", [1024, 6480])  # 6480 = 12*512 + 336 (masked)
def test_fused_matches_reference(C, N):
    x, w_qkv, w_out, b_out = _inputs(2, N, C)
    want = linear_attention_reference(x, w_qkv, w_out, b_out)
    got = fused_linear_attention(x, w_qkv, w_out, b_out, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_fused_bf16():
    x, w_qkv, w_out, b_out = _inputs(2, 2048, 32, dtype=jnp.bfloat16, seed=1)
    want = linear_attention_reference(x, w_qkv, w_out, b_out)
    got = fused_linear_attention(x, w_qkv, w_out, b_out, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_mask_exactness():
    """The masked tail must contribute nothing: computing on N and on a
    zero-padded N+pad input (restricted to the first N rows) agrees."""
    N = 700  # 512 + 188
    x, w_qkv, w_out, b_out = _inputs(1, N, 32, seed=2)
    out = fused_linear_attention(x, w_qkv, w_out, b_out, interpret=True)
    want = linear_attention_reference(x, w_qkv, w_out, b_out)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_fused_gradients_match_reference():
    """Training differentiates through block attention: the kernel's custom
    VJP (backward = VJP of the XLA formulation) must match grads of the
    reference end to end, for x and every weight."""
    x, w_qkv, w_out, b_out = _inputs(2, 700, 32, seed=3)

    def loss_fused(x, w_qkv, w_out, b_out):
        y = fused_linear_attention(x, w_qkv, w_out, b_out, interpret=True)
        return jnp.sum(y * y)

    def loss_ref(x, w_qkv, w_out, b_out):
        y = linear_attention_reference(x, w_qkv, w_out, b_out)
        return jnp.sum(y * y)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w_qkv, w_out, b_out)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w_qkv, w_out, b_out)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-5
        )


def _block_inputs(B, N, C, D=32, dtype=jnp.float32, seed=0):
    x, w_qkv, w_out, b_out = _inputs(B, N, C, D, dtype, seed)
    ks = jax.random.split(jax.random.PRNGKey(seed + 100), 4)
    gps = 1.0 + 0.1 * jax.random.normal(ks[0], (C,))
    gpb = 0.1 * jax.random.normal(ks[1], (C,))
    gos = 1.0 + 0.1 * jax.random.normal(ks[2], (C,))
    gob = 0.1 * jax.random.normal(ks[3], (C,))
    return x, gps, gpb, w_qkv, w_out, b_out, gos, gob


@pytest.mark.parametrize("N", [1024, 6480])  # 6480 exercises the masked tail
def test_fused_block_matches_reference(N):
    args = _block_inputs(2, N, 32)
    want = attention_block_reference(*args)
    got = fused_attention_block(*args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_fused_block_bf16():
    args = _block_inputs(2, 2048, 32, dtype=jnp.bfloat16, seed=1)
    want = attention_block_reference(*args)
    got = fused_attention_block(*args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_fused_block_gradients_match_reference():
    """The Pallas backward kernel vs the XLA reference VJP in f32.  Both
    carry their own f32 roundoff through the GroupNorm-backward
    cancellations (~1e-4 max-norm relative, measured), so compare in
    max-norm; `test_fused_block_gradients_f64_truth` pins the kernel much
    tighter against f64 ground truth."""
    args = _block_inputs(2, 700, 32, seed=3)

    def loss_fused(*a):
        y = fused_attention_block(*a, interpret=True)
        return jnp.sum(y * y)

    def loss_ref(*a):
        y = attention_block_reference(*a)
        return jnp.sum(y * y)

    idx = tuple(range(len(args)))
    got = jax.grad(loss_fused, argnums=idx)(*args)
    want = jax.grad(loss_ref, argnums=idx)(*args)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        err = np.max(np.abs(g - w)) / (np.max(np.abs(w)) + 1e-9)
        assert err < 3e-3, f"max-norm-relative grad error {err:.2e}"


def test_fused_block_gradients_f64_truth():
    """The backward kernel computes internally in f32; against the f64
    reference VJP its grads must sit at f32-roundoff scale (~1e-6
    max-norm relative) — any missing/wrong term would show at 1e-4+."""
    import contextlib

    @contextlib.contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        ks = jax.random.split(jax.random.PRNGKey(7), 8)
        C, D = 32, 32
        mk = lambda k, sh, s, o=0.0: (
            jax.random.normal(k, sh, jnp.float64) * s + o)
        args = (mk(ks[0], (2, 700, C), 1.0), mk(ks[1], (C,), 0.5, 1.0),
                mk(ks[2], (C,), 0.1), mk(ks[3], (C, 3 * D), 0.2),
                mk(ks[4], (D, C), 0.2), mk(ks[5], (C,), 0.1),
                mk(ks[6], (C,), 0.5, 1.0), mk(ks[7], (C,), 0.1))
        idx = tuple(range(len(args)))
        got = jax.grad(
            lambda *a: jnp.sum(fused_attention_block(*a, interpret=True) ** 2),
            argnums=idx)(*args)
        want = jax.grad(
            lambda *a: jnp.sum(attention_block_reference(*a) ** 2),
            argnums=idx)(*args)
        for g, w in zip(got, want):
            g, w = np.asarray(g), np.asarray(w)
            err = np.max(np.abs(g - w)) / (np.max(np.abs(w)) + 1e-12)
            assert err < 1e-5, f"max-norm-relative grad error {err:.2e}"


def test_training_trace_formulation_matches():
    """Inside training_trace() LinearAttention switches to the 1x1-conv
    heads-first formulation (faster XLA backward); it must agree with the
    flattened-einsum inference formulation to float tolerance."""
    from calodiffusion_tpu.models.nn_modules import LinearAttention

    B, Z, A, R, C = 2, 5, 6, 7, 32
    m = LinearAttention()
    x = jax.random.normal(jax.random.PRNGKey(1), (B, Z, A, R, C))
    params = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(params, x)
    with training_trace():
        got = m.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )

    def loss(p, mod=m):
        return jnp.sum(mod.apply(p, x) ** 2)

    g_want = jax.grad(loss)(params)
    with training_trace():
        g_got = jax.grad(loss)(params)
    for gw, gg in zip(
        jax.tree_util.tree_leaves(g_want), jax.tree_util.tree_leaves(g_got)
    ):
        # conv-backward vs einsum-backward accumulate in different orders;
        # tolerance covers f32 reduction reordering only
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), rtol=2e-3, atol=2e-5
        )


def test_training_trace_flag():
    assert not in_training_trace()
    with training_trace():
        assert in_training_trace()
        with training_trace():
            assert in_training_trace()
        assert in_training_trace()
    assert not in_training_trace()


def test_prenorm_residual_param_tree_and_output():
    """PreNormResidual(LinearAttention) must keep the GroupNorm_0/fn param
    layout and reproduce GroupNorm-module + attention + residual math on the
    unfused (CPU) path."""
    from calodiffusion_tpu.models.nn_modules import (
        GroupNorm,
        LinearAttention,
        PreNormResidual,
    )

    B, Z, A, R, C = 2, 5, 6, 7, 32
    m = PreNormResidual(LinearAttention())
    x = jax.random.normal(jax.random.PRNGKey(1), (B, Z, A, R, C))
    params = m.init(jax.random.PRNGKey(0), x)
    tree = params["params"]
    assert set(tree) == {"GroupNorm_0", "fn"}
    assert set(tree["fn"]) == {"Conv3d_0", "Conv3d_1", "GroupNorm_0"}
    assert tree["GroupNorm_0"]["scale"].shape == (C,)
    got = m.apply(params, x)

    gn = GroupNorm(1)
    xn = gn.apply({"params": tree["GroupNorm_0"]}, x)
    attn = LinearAttention()
    want = x + attn.apply({"params": tree["fn"]}, xn)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_module_param_tree_unchanged():
    """LinearAttention must keep the Conv3d_0/Conv3d_1/GroupNorm_0 param
    layout (checkpoints + tools/torch_import depend on the names)."""
    from calodiffusion_tpu.models.nn_modules import LinearAttention

    m = LinearAttention()
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4, 32)))
    tree = params["params"]
    assert set(tree) == {"Conv3d_0", "Conv3d_1", "GroupNorm_0"}
    assert tree["Conv3d_0"]["kernel"].shape == (1, 1, 1, 32, 96)
    assert "bias" not in tree["Conv3d_0"]
    assert tree["Conv3d_1"]["kernel"].shape == (1, 1, 1, 32, 32)
    assert tree["Conv3d_1"]["bias"].shape == (32,)


def test_module_output_matches_previous_formula():
    """The rewired module must reproduce the original (b,h,d,N)-layout
    implementation exactly (same math, different layout)."""
    from calodiffusion_tpu.models.nn_modules import GroupNorm, LinearAttention

    B, Z, A, R, C = 2, 5, 6, 7, 32
    m = LinearAttention()
    x = jax.random.normal(jax.random.PRNGKey(1), (B, Z, A, R, C))
    params = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(params, x)

    # original formulation, using the same weights
    w_qkv = params["params"]["Conv3d_0"]["kernel"].reshape(C, 96)
    w_out = params["params"]["Conv3d_1"]["kernel"].reshape(32, C)
    b_out = params["params"]["Conv3d_1"]["bias"]
    n = Z * A * R
    qkv = jnp.einsum("bnc,ck->bnk", x.reshape(B, n, C), w_qkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (t.transpose(0, 2, 1) for t in (q, k, v))  # (b, d, N)
    q = jax.nn.softmax(q, axis=-2) * (32 ** -0.5)
    k = jax.nn.softmax(k, axis=-1)
    context = jnp.einsum("bdn,ben->bde", k, v)
    out = jnp.einsum("bde,bdn->ben", context, q)
    out = out.transpose(0, 2, 1) @ w_out + b_out
    gn = GroupNorm(1)
    want = gn.apply(
        {"params": params["params"]["GroupNorm_0"]},
        out.reshape(B, Z, A, R, C),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
