"""AOT model export: a self-contained serving artifact via `jax.export`.

The reference's only deployment story is re-running its Python scripts per
image (test.py:104-123); this module instead freezes a checkpointed
generator into ONE file containing the serialized StableHLO module of the
uint8-in/uint8-out translation step with the weights embedded as module
constants. The artifact:

- needs only `jax` (+ the target plugin) to run — no flax, no aclgan_tpu, no
  checkpoint loader, no config parsing at serve time;
- is compiled ahead-of-time for an explicit platform list (export for TPU
  from a CPU box works: lowering is platform-checked, not executed);
- has static shapes (batch, size, size, 3), so serving it can never trigger
  a recompile storm — the same contract as `serving.Translator`.

File layout (format 1):
    8-byte magic  b"ACLGEXP1"
    4-byte little-endian JSON header length
    JSON header   (batch/size/a2b/style_dim/focus/platforms/versions)
    payload       jax.export serialized bytes

Use `export_translator` + `save_artifact` (or `cli/export.py`) to produce
one, and `ExportedTranslator` (or raw `load_artifact().call`) to serve it.
"""

from __future__ import annotations

import json
import struct
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"ACLGEXP1"
_FORMAT = 1


def export_translator(
    config,
    checkpoint: str,
    a2b: bool = True,
    batch_size: int = 32,
    size: Optional[int] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
):
    """Freeze a generator checkpoint into a `jax.export.Exported` translation
    step (the test.py:96-111 bar path: content encode -> AdaIN decode ->
    focus blend -> uint8), weights embedded.

    Returns (exported, meta_dict). Only the single generator the direction
    uses (`AB` for a2b else `BA`) is embedded — translate never touches the
    other one (trainer.translate, both uses index the same key).
    """
    from aclgan_tpu.config import Config, load_config
    from aclgan_tpu.trainer import ACLGAN

    cfg = load_config(config) if isinstance(config, str) else config
    size_a, size_b = cfg.data.resolved_sizes()
    size = size or (size_a if a2b else size_b) or 256
    stride = 2 ** cfg.gen.n_downsample
    if size % stride:
        raise ValueError(f"size {size} must be a multiple of the generator "
                         f"stride {stride} (2**n_downsample)")
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")

    model = ACLGAN(cfg)

    from aclgan_tpu.cli.test import load_generator_params

    gen_params = load_generator_params(checkpoint, model)
    enc_key = "AB" if a2b else "BA"
    # embed only the used subtree; jax.export captures it as constants
    one = jax.tree.map(jnp.asarray, gen_params[enc_key])
    frozen = {enc_key: one}

    def translate_u8(x_u8, z):
        img, mask = model.translate(frozen, x_u8, z, a2b=a2b)
        img01 = jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5, 0, 255)
        out = {"image": img01.astype(jnp.uint8)}
        if mask is not None:
            out["mask"] = mask.astype(jnp.float32)
        return out

    exported = jax.export.export(jax.jit(translate_u8),
                                 platforms=list(platforms))(
        jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch_size, cfg.gen.style_dim), jnp.float32),
    )
    meta = {
        "format": _FORMAT,
        "batch_size": batch_size,
        "size": size,
        "a2b": bool(a2b),
        "style_dim": int(cfg.gen.style_dim),
        "focus": bool(model.use_focus),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    return exported, meta


def save_artifact(exported, meta: dict, path: str) -> None:
    payload = bytes(exported.serialize())
    header = json.dumps(meta).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(payload)


def load_artifact(path: str):
    """-> (jax.export.Exported, meta). `exported.call(x_u8, z)` serves it."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an aclgan export artifact "
                             f"(bad magic {magic!r})")
        (hlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        if meta.get("format") != _FORMAT:
            raise ValueError(f"{path}: unsupported artifact format "
                             f"{meta.get('format')!r}")
        payload = f.read()
    return jax.export.deserialize(bytearray(payload)), meta


class ExportedTranslator:
    """Serve an exported artifact with the `serving.Translator` list API
    (shortest-side resize + center crop, tail-batch padding, per-image
    styles) — but loading zero model code: the graph and weights come from
    the artifact."""

    def __init__(self, path: str, seed: int = 0):
        self.exported, self.meta = load_artifact(path)
        self.batch_size = int(self.meta["batch_size"])
        self.size = int(self.meta["size"])
        self.style_dim = int(self.meta["style_dim"])
        self._key = jax.random.PRNGKey(seed)

    def random_style(self, n: int = 1) -> np.ndarray:
        self._key, sub = jax.random.split(self._key)
        return np.asarray(jax.random.normal(sub, (n, self.style_dim)))

    def __call__(
        self,
        images: Sequence[np.ndarray],
        styles: Optional[np.ndarray] = None,
        return_masks: bool = False,
    ) -> Union[List[np.ndarray], Tuple[List[np.ndarray], Optional[list]]]:
        from aclgan_tpu.serving import prep_image

        n = len(images)
        if n == 0:
            return ([], None) if return_masks else []
        prepped = np.stack([prep_image(im, self.size) for im in images])
        if styles is None:
            styles = self.random_style(n)
        styles = np.asarray(styles, np.float32)
        if styles.ndim == 1:
            styles = np.broadcast_to(styles[None], (n, styles.shape[0]))

        outs: List[np.ndarray] = []
        masks: list = []
        bs = self.batch_size
        for start in range(0, n, bs):
            chunk = prepped[start:start + bs]
            zc = styles[start:start + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
                zc = np.concatenate([zc, np.repeat(zc[-1:], pad, 0)])
            out = self.exported.call(jnp.asarray(chunk),
                                     jnp.asarray(zc, jnp.float32))
            keep = bs - pad
            outs.extend(list(np.asarray(out["image"])[:keep]))
            if "mask" in out:
                masks.extend(list(np.asarray(out["mask"])[:keep]))
        if return_masks:
            return outs, (masks if masks else None)
        return outs
