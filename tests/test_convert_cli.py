"""Convert CLI: torch .pt -> msgpack; converted checkpoint loads in test CLI."""

import numpy as np
import torch

import jax

from aclgan_tpu.trainer import ACLGAN
from aclgan_tpu.utils.checkpoint import load_gen_params
from tests.helpers import tiny_config
from tests.test_torch_import import _gen_state_dict_from_flax


def test_convert_cli_roundtrip(tmp_path):
    from aclgan_tpu.cli.convert import main
    from aclgan_tpu.config import save_config

    cfg = tiny_config()
    cfg_path = tmp_path / "cfg.yaml"
    save_config(cfg, cfg_path)

    model = ACLGAN(cfg)
    state = model.init_state(jax.random.PRNGKey(0))
    sd = {k: _gen_state_dict_from_flax(state.gen_params[k], cfg.gen)
          for k in ("AB", "BA")}
    pt_path = tmp_path / "gen_00001234.pt"
    torch.save(sd, pt_path)

    out_dir = tmp_path / "out"
    main(["--config", str(cfg_path), "--gen", str(pt_path),
          "--output_dir", str(out_dir)])
    converted = out_dir / "gen_00001234.msgpack"
    assert converted.exists()

    loaded = load_gen_params(str(converted), state.gen_params)
    flat_a = jax.tree_util.tree_leaves(loaded)
    flat_b = jax.tree_util.tree_leaves(state.gen_params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
