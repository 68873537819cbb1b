"""Serving Translator: end-to-end uint8 API over a checkpoint."""

import numpy as np
import pytest

import jax

from aclgan_tpu.serving import Translator
from aclgan_tpu.trainer import ACLGAN
from aclgan_tpu.utils.checkpoint import save_checkpoint
from tests.helpers import tiny_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    cfg = tiny_config()
    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    save_checkpoint(str(root), state, iterations=0)
    return cfg, str(root / "gen_00000001.msgpack")


def test_translator_batches_and_pads(ckpt):
    cfg, gen_path = ckpt
    tr = Translator(cfg, gen_path, a2b=True, batch_size=4, size=16, seed=1)
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (24, 20, 3), dtype=np.uint8) for _ in range(6)]
    outs = tr(imgs)
    assert len(outs) == 6
    for o in outs:
        assert o.shape == (16, 16, 3) and o.dtype == np.uint8


def test_translator_style_control(ckpt):
    cfg, gen_path = ckpt
    tr = Translator(cfg, gen_path, batch_size=2, size=16, seed=2)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
    z1 = np.zeros((cfg.gen.style_dim,), np.float32)
    z2 = np.full((cfg.gen.style_dim,), 2.0, np.float32)
    a = tr([img], styles=z1)[0]
    b = tr([img], styles=z2)[0]
    a2 = tr([img], styles=z1)[0]
    np.testing.assert_array_equal(a, a2)  # deterministic given style
    assert not np.array_equal(a, b)       # style changes output

    style_code = tr.encode_style(img)
    assert style_code.shape == (1, cfg.gen.style_dim)
    outs, masks = tr([img], styles=style_code[0], return_masks=True)
    assert masks is not None and masks[0].shape == (16, 16, 1)
