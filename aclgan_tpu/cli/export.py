"""Export a generator checkpoint as a self-contained AOT serving artifact.

    python -m aclgan_tpu.cli.export --config configs/male2female.yaml \
        --checkpoint outputs/male2female/checkpoints/gen_00350000.msgpack \
        --output male2female_a2b.aclx --batch 128 --platforms tpu,cpu

The artifact embeds the StableHLO translation graph AND the weights; serve
it with `aclgan_tpu.export.ExportedTranslator` (or raw
`jax.export`-deserialized `.call`) — no checkpoint, config, or model code
needed at serve time. The reference has no deployment surface at all (its
inference is the per-image python loop of test.py:104-123).
"""

from __future__ import annotations

import argparse
import os
import sys

from aclgan_tpu.export import export_translator, save_artifact


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--output", type=str, required=True,
                   help="artifact path (convention: .aclx)")
    p.add_argument("--a2b", type=int, default=1, help="1 for a2b, 0 for b2a")
    p.add_argument("--batch", type=int, default=32,
                   help="compiled batch (requests pad to it; 128 for bulk)")
    p.add_argument("--size", type=int, default=0,
                   help="square input size (default: config new_size)")
    p.add_argument("--platforms", type=str, default="tpu,cpu",
                   help="comma-separated lowering targets")
    opts = p.parse_args(argv)

    platforms = tuple(s.strip() for s in opts.platforms.split(",") if s.strip())
    if not platforms:
        sys.exit("--platforms must name at least one target")
    if opts.batch < 1:
        sys.exit(f"--batch must be >= 1, got {opts.batch}")
    if not os.path.exists(opts.checkpoint):
        sys.exit(f"checkpoint not found: {opts.checkpoint}")

    exported, meta = export_translator(
        opts.config, opts.checkpoint, a2b=bool(opts.a2b),
        batch_size=opts.batch, size=opts.size or None, platforms=platforms)
    save_artifact(exported, meta, opts.output)
    sz = os.path.getsize(opts.output)
    print(f"wrote {opts.output} ({sz / 1e6:.1f} MB): "
          f"batch={meta['batch_size']} size={meta['size']} "
          f"a2b={meta['a2b']} platforms={','.join(meta['platforms'])}")


if __name__ == "__main__":
    main()
