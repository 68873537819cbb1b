"""One-shot checkpoint converter: reference PyTorch .pt -> our msgpack.

`python -m aclgan_tpu.cli.convert --config <yaml> --gen gen_00350000.pt
   [--dis dis_00350000.pt] --output_dir checkpoints/`

The SURVEY §5.4 import tool as a CLI (the reference's only converter is the
legacy pytorch-0.3 key-stripper, utils.py:309-388). Inference CLIs also load
.pt directly; this converter materializes msgpack files so training can
--resume from ported weights (optimizer moments start fresh).
"""

from __future__ import annotations

import argparse
import os

import flax.serialization
import jax

from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache
from aclgan_tpu.config import load_config
from aclgan_tpu.trainer import ACLGAN
from aclgan_tpu.utils.checkpoint import _atomic_write
from aclgan_tpu.utils.torch_import import (
    import_torch_dis_checkpoint,
    import_torch_gen_checkpoint,
)


_enable_compile_cache()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--gen", type=str, required=True, help="gen_*.pt path")
    parser.add_argument("--dis", type=str, default=None, help="dis_*.pt path")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--iteration", type=int, default=None,
                        help="iteration stamp; default parsed from filename")
    opts = parser.parse_args(argv)

    cfg = load_config(opts.config)
    model = ACLGAN(cfg)
    template = model.init_state(jax.random.PRNGKey(0))

    if opts.iteration is not None:
        it = opts.iteration
    else:
        stem = os.path.basename(opts.gen).split(".")[0]
        try:
            it = int(stem.split("_")[-1])
        except ValueError:
            it = 0

    os.makedirs(opts.output_dir, exist_ok=True)
    gen_params = import_torch_gen_checkpoint(opts.gen, template.gen_params, cfg.gen)
    gen_out = os.path.join(opts.output_dir, "gen_%08d.msgpack" % it)
    _atomic_write(gen_out, flax.serialization.to_bytes(gen_params))
    print(f"wrote {gen_out}")

    if opts.dis:
        dis_params = import_torch_dis_checkpoint(opts.dis, template.dis_params, cfg.dis)
        spectral = template.dis_spectral
        dis_tree = {"params": dis_params, "spectral": spectral}
        if cfg.dis.norm == "sn":
            # carry the reference's converged power-iteration u/v vectors
            from aclgan_tpu.utils.torch_import import import_torch_dis_spectral

            dis_tree["spectral"] = import_torch_dis_spectral(
                opts.dis, spectral, cfg.dis)
        elif cfg.dis.norm == "bn":
            # carry the reference's bn running mean/var
            from aclgan_tpu.utils.torch_import import import_torch_dis_stats

            dis_tree["batch_stats"] = import_torch_dis_stats(
                opts.dis, template.dis_stats, cfg.dis)
        dis_out = os.path.join(opts.output_dir, "dis_%08d.msgpack" % it)
        _atomic_write(dis_out, flax.serialization.to_bytes(dis_tree))
        print(f"wrote {dis_out}")

    # mark the directory as a deliberate import: load_checkpoint accepts a
    # missing optimizer.msgpack (fresh moments) only with this marker, so a
    # torn training snapshot cannot masquerade as a converted checkpoint
    with open(os.path.join(opts.output_dir, "imported.marker"), "w"):
        pass


if __name__ == "__main__":
    main()
