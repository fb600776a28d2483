"""Full softmax Attention module vs torch reference math, and HLF drawing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calodiffusion_tpu.models.nn_modules import Attention

torch = pytest.importorskip("torch")


def test_attention_module_matches_torch_math():
    """The module must reproduce the reference attention algebra
    (reference models.py:246-278) given identical qkv/out weights."""
    b, zz, aa, rr, c = 2, 3, 4, 3, 8
    heads, dim_head = 2, 4
    hidden = heads * dim_head

    attn = Attention(heads=heads, dim_head=dim_head, cylindrical=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, zz, aa, rr, c))
    params = attn.init(jax.random.PRNGKey(1), x)
    out = np.asarray(attn.apply(params, x))
    assert out.shape == x.shape

    # torch-side recomputation with the same weights
    w_qkv = np.asarray(params["params"]["Conv3d_0"]["kernel"])  # (1,1,1,c,3h)
    w_out = np.asarray(params["params"]["Conv3d_1"]["kernel"])
    b_out = np.asarray(params["params"]["Conv3d_1"]["bias"])

    xt = torch.tensor(np.moveaxis(np.asarray(x), -1, 1))  # (b,c,z,a,r)
    qkv = torch.conv3d(xt, torch.tensor(np.transpose(w_qkv, (4, 3, 0, 1, 2))))
    q, k, v = qkv.chunk(3, dim=1)

    def rearr(t):
        bb, hc, z, a, r = t.shape
        return t.reshape(bb, heads, dim_head, z * a * r)

    q, k, v = map(rearr, (q, k, v))
    q = q * dim_head ** -0.5
    sim = torch.einsum("bhdi,bhdj->bhij", q, k)
    sim = sim - sim.amax(dim=-1, keepdim=True)
    attn_w = sim.softmax(dim=-1)
    o = torch.einsum("bhij,bhdj->bhid", attn_w, v)
    o = o.permute(0, 1, 3, 2).reshape(b, hidden, zz, aa, rr)
    o = torch.conv3d(o, torch.tensor(np.transpose(w_out, (4, 3, 0, 1, 2))),
                     torch.tensor(b_out))
    expected = np.moveaxis(o.detach().numpy(), 1, -1)
    np.testing.assert_allclose(out, expected, atol=2e-5)


def test_hlf_draw_single_shower(tmp_path):
    from calodiffusion_tpu.evaluation.hlf import HighLevelFeatures

    xml = tmp_path / "binning.xml"
    xml.write_text(
        """<Bins><Particle name="photon">
        <Bin id="0" r_edges="0,5,10,30" n_bin_alpha="4"/>
        <Bin id="1" r_edges="0,10,30" n_bin_alpha="8"/>
        </Particle></Bins>"""
    )
    hlf = HighLevelFeatures("photon", str(xml))
    data = np.random.default_rng(0).exponential(1.0, hlf.bin_edges[-1])
    out = tmp_path / "shower.png"
    hlf.DrawSingleShower(data, filename=str(out), title="test")
    assert out.exists() and out.stat().st_size > 0
