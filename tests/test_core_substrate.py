"""Registry, config, metrics, checkpoint round-trip."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from xrnerf_tpu.config import Config, load_config, replace_dataname
from xrnerf_tpu.registry import Registry
from xrnerf_tpu.utils import checkpoint as ckpt
from xrnerf_tpu.utils.metrics import huber, img2mse, mse2psnr, psnr, ssim


def test_registry_build():
    reg = Registry("t")

    @reg.register
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = reg.build({"type": "Foo", "a": 1})
    assert obj.a == 1 and obj.b == 2
    with pytest.raises(KeyError):
        reg.build({"type": "Bar"})
    with pytest.raises(KeyError):
        reg.build({"a": 1})


def test_config_attr_and_dataname(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text(
        "model = dict(type='NerfNetwork', n_samples=64)\n"
        "data = dict(datadir='data/#DATANAME#')\n"
        "max_iters = 100\n"
    )
    cfg = load_config(str(p), dataname="lego")
    assert cfg.model.type == "NerfNetwork"
    assert cfg.data.datadir == "data/lego"
    assert cfg.max_iters == 100
    cfg2 = Config({"a": {"b": [1, {"c": "#DATANAME#"}]}})
    assert replace_dataname(cfg2, "x").a.b[1].c == "x"


def test_metrics_values():
    a = jnp.zeros((8, 8, 3))
    b = jnp.ones((8, 8, 3)) * 0.5
    assert float(img2mse(a, b)) == pytest.approx(0.25)
    assert float(mse2psnr(jnp.asarray(0.01))) == pytest.approx(20.0, abs=1e-3)
    assert float(psnr(a, a)) >= 99.9
    # huber: quadratic inside delta
    assert float(huber(a, a + 0.01, delta=0.1)) == pytest.approx(0.5 * 1e-4, rel=1e-4)


def test_ssim_identity_and_range(rng_np):
    img = jnp.asarray(rng_np.rand(24, 24, 3).astype(np.float32))
    s_same = float(ssim(img, img))
    assert s_same == pytest.approx(1.0, abs=1e-4)
    noisy = jnp.clip(img + 0.5 * jnp.asarray(rng_np.randn(24, 24, 3).astype(np.float32)), 0, 1)
    s_noisy = float(ssim(img, noisy))
    assert -1.0 <= s_noisy < s_same


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}, "step": np.int32(7)}
    path = ckpt.save(str(tmp_path), 7, state)
    assert os.path.exists(path)
    restored = ckpt.load(path, state)
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    assert ckpt.all_steps(str(tmp_path)) == [7]
    # keep=1 cleanup
    ckpt.save(str(tmp_path), 8, state, keep=1)
    assert ckpt.all_steps(str(tmp_path)) == [8]


def test_lpips_fake_weights(tmp_path):
    """LPIPS runs against any VGG16-features-shaped state dict; zero for
    identical images, positive for different ones."""
    import torch

    from xrnerf_tpu.utils.metrics import LPIPS

    sd = {}
    cin = 3
    for i, co in enumerate([8, 8, 16, 16, 16, 16, 16, 16, 16, 16, 16, 16, 16]):
        sd[f"features.{i}.weight"] = torch.randn(co, cin, 3, 3) * 0.05
        sd[f"features.{i}.bias"] = torch.zeros(co)
        cin = co
    path = str(tmp_path / "vgg.pth")
    torch.save(sd, path)
    lp = LPIPS(path)
    rng = np.random.RandomState(0)
    a = rng.rand(32, 32, 3).astype(np.float32)
    b = rng.rand(32, 32, 3).astype(np.float32)
    assert lp(a, a) < 1e-8
    assert lp(a, b) > 0


def test_batch_prefetcher_order_and_close():
    from xrnerf_tpu.core.prefetch import BatchPrefetcher

    fetched = []
    pf = BatchPrefetcher(
        fetch=lambda s: {"step": s},
        put=lambda b: {**b, "staged": True},
        start_step=3,
        max_steps=8,
    )
    for s in range(3, 8):
        b = pf.get(s)
        assert b["step"] == s and b["staged"]
    pf.close()


def test_batch_prefetcher_propagates_errors():
    from xrnerf_tpu.core.prefetch import BatchPrefetcher

    def bad_fetch(s):
        if s == 1:
            raise RuntimeError("boom")
        return {}

    pf = BatchPrefetcher(bad_fetch, lambda b: b, 0, 5)
    pf.get(0)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        pf.get(1)
    pf.close()
