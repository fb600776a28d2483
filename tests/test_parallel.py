"""Multi-device SPMD tests on the 8-virtual-CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from calodiffusion_tpu.models.diffusion import CaloDiffusion
from calodiffusion_tpu.parallel import mesh as mesh_lib
from tests.utils_test import fake_batch, tiny_ds2_config


@pytest.fixture(scope="module")
def small_model():
    cfg = tiny_ds2_config(LAYER_SIZE_UNET=[8, 8, 8, 8], COND_SIZE_UNET=16,
                          NSTEPS=4)
    model = CaloDiffusion(cfg, n_steps=4)
    params = model.init(jax.random.PRNGKey(0))
    return cfg, model, params


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "model")
    mesh42 = mesh_lib.make_mesh(data=4, model=2)
    assert mesh42.devices.shape == (4, 2)


def test_sharded_loss_matches_single_device(small_model):
    """Data-parallel loss over the mesh == single-device loss."""
    cfg, model, params = small_model
    data, E, layers = fake_batch(cfg, batch=8)
    key = jax.random.PRNGKey(5)

    loss_single = float(model.compute_loss(
        params, key, jnp.asarray(data), jnp.asarray(E),
        layers=jnp.asarray(layers)))

    mesh = mesh_lib.make_mesh()
    sh = mesh_lib.batch_sharding(mesh)
    data_s = jax.device_put(jnp.asarray(data), sh)
    E_s = jax.device_put(jnp.asarray(E), sh)
    lay_s = jax.device_put(jnp.asarray(layers), sh)
    params_r = mesh_lib.replicate(mesh, params)

    loss_sharded = float(jax.jit(
        lambda p, d, e, l: model.compute_loss(p, key, d, e, layers=l)
    )(params_r, data_s, E_s, lay_s))

    np.testing.assert_allclose(loss_sharded, loss_single, rtol=1e-4)


@pytest.mark.slow  # ~30s
def test_sharded_train_step_keeps_params_replicated(small_model):
    cfg, model, params = small_model
    data, E, layers = fake_batch(cfg, batch=8)
    mesh = mesh_lib.make_mesh()
    sh = mesh_lib.batch_sharding(mesh)
    params = mesh_lib.replicate(mesh, params)
    opt = optax.adam(1e-3)
    opt_state = mesh_lib.replicate(mesh, opt.init(params))

    @jax.jit
    def step(params, opt_state, d, e, l):
        loss, grads = jax.value_and_grad(
            lambda p: model.compute_loss(p, jax.random.PRNGKey(0), d, e,
                                         layers=l)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params2, opt_state, loss = step(
        params, opt_state,
        jax.device_put(jnp.asarray(data), sh),
        jax.device_put(jnp.asarray(E), sh),
        jax.device_put(jnp.asarray(layers), sh),
    )
    assert np.isfinite(float(loss))
    # gradient all-reduce keeps parameters identical across devices
    leaf = jax.tree_util.tree_leaves(params2)[0]
    assert len(leaf.sharding.device_set) in (1, 8)  # replicated layout


def test_pad_batch_to_multiple():
    arrays = (np.ones((5, 3)), np.ones((5, 1)), None)
    (a, b, c), n_real = mesh_lib.pad_batch_to_multiple(arrays, 4)
    assert a.shape[0] == 8 and b.shape[0] == 8
    assert c is None
    assert n_real == 5


def test_sharded_sampling(small_model):
    """The full reverse-diffusion scan runs SPMD over the data axis."""
    cfg, model, params = small_model
    mesh = mesh_lib.make_mesh()
    sh = mesh_lib.batch_sharding(mesh)
    params_r = mesh_lib.replicate(mesh, params)

    _, E, layers = fake_batch(cfg, batch=8)
    E_s = jax.device_put(jnp.asarray(E), sh)
    lay_s = jax.device_put(jnp.asarray(layers), sh)

    sampler = model.make_sampler()
    out = jax.jit(
        lambda p, e, l: model.sample(p, jax.random.PRNGKey(0), e, layers=l,
                                     num_steps=4, sampler=sampler)
    )(params_r, E_s, lay_s)
    assert out.shape == (8, 1, 45, 16, 9)
    assert np.all(np.isfinite(np.asarray(out)))
    # the generated batch stays sharded over all devices
    assert len(out.sharding.device_set) == 8


@pytest.mark.slow  # ~40s
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
