"""Single-image inference CLI — rebuild of the reference's test.py:19-131.

`python -m aclgan_tpu.cli.test --config <yaml> --input img.jpg
   --output_folder out/ --checkpoint gen_xxxx.msgpack [--style s.jpg]
   [--a2b 1] [--seed 10] [--num_style 10] [--output_only]`

Differences from the reference (by design): all `num_style` decodes run as ONE
batched jitted call (the reference loops per style, test.py:104-123); the
checkpoint can be our msgpack or a torch .pt (auto-imported via
aclgan_tpu.utils.torch_import).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache
from aclgan_tpu.config import load_config
from aclgan_tpu.data.transforms import normalize_batch, resize_shortest
from aclgan_tpu.trainer import ACLGAN
from aclgan_tpu.utils.checkpoint import load_gen_params
from aclgan_tpu.utils.image import save_image


def load_generator_params(path: str, model: ACLGAN):
    """msgpack (ours) or torch .pt (imported) -> {'AB','BA'} params."""
    template = model.init_state(jax.random.PRNGKey(0)).gen_params
    if path.endswith(".pt") or path.endswith(".pth"):
        from aclgan_tpu.utils.torch_import import import_torch_gen_checkpoint

        return import_torch_gen_checkpoint(path, template)
    return load_gen_params(path, template)


_enable_compile_cache()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, help="net configuration")
    parser.add_argument("--input", type=str, help="input image path")
    parser.add_argument("--output_folder", type=str, help="output image path")
    parser.add_argument("--checkpoint", type=str, help="checkpoint of autoencoders")
    parser.add_argument("--style", type=str, default="", help="style image path")
    parser.add_argument("--a2b", type=int, default=1, help="1 for a2b and 0 for b2a")
    parser.add_argument("--seed", type=int, default=10, help="random seed")
    parser.add_argument("--num_style", type=int, default=10,
                        help="number of styles to sample")
    parser.add_argument("--synchronized", action="store_true")
    parser.add_argument("--output_only", action="store_true")
    parser.add_argument("--output_path", type=str, default=".")
    parser.add_argument("--trainer", type=str, default="aclgan")
    opts = parser.parse_args(argv)

    if opts.trainer != "aclgan":
        sys.exit("Only support aclgan")

    cfg = load_config(opts.config)
    num_style = 1 if opts.style != "" else opts.num_style
    os.makedirs(opts.output_folder, exist_ok=True)

    model = ACLGAN(cfg)
    gen_params = load_generator_params(opts.checkpoint, model)

    # Resize shortest side only, no crop (test.py:89-91)
    size_a, size_b = cfg.data.resolved_sizes()
    new_size = size_a if opts.a2b else size_b
    img = resize_shortest(Image.open(opts.input).convert("RGB"), new_size)
    arr = np.asarray(img, np.uint8)
    # pad to a multiple of the generator stride (2^n_downsample) so the
    # decoder output matches the input spatially; cropped back after decode.
    # (the torch reference errors on such sizes — test.py:110 blend)
    stride = 2 ** cfg.gen.n_downsample
    h0, w0 = arr.shape[:2]
    ph, pw = (-h0) % stride, (-w0) % stride
    if ph or pw:
        arr = np.pad(arr, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    x = jnp.asarray(normalize_batch(arr[None]))

    key = jax.random.PRNGKey(opts.seed)
    if opts.style:
        s_img = resize_shortest(Image.open(opts.style).convert("RGB"), new_size)
        s_x = jnp.asarray(normalize_batch(np.asarray(s_img, np.uint8)[None]))
        enc_key = "AB" if opts.a2b else "BA"
        _, style = model.gen_encode(gen_params[enc_key], s_x.astype(model.dtype))
        styles = style
    else:
        styles = jax.random.normal(key, (num_style, cfg.gen.style_dim))

    # one batched decode over all styles (content broadcast)
    x_rep = jnp.repeat(x, num_style, axis=0)

    from aclgan_tpu import losses as L

    @jax.jit
    def run(params, xs, ss):
        enc_key = "AB" if opts.a2b else "BA"
        content, _ = model.gen_encode(params[enc_key], xs.astype(model.dtype))
        dec = model.gen_decode(params[enc_key], content, ss.astype(model.dtype))
        raw, mask = model._split_img_mask(dec)
        if mask is not None:
            blended = L.focus_translation_eval(raw, xs.astype(raw.dtype), mask)
        else:
            blended = raw
        return blended, raw, mask

    outputs, raw_imgs, masks = run(gen_params, x_rep, styles)
    outputs = np.asarray(outputs, np.float32)[:, :h0, :w0]
    raw_imgs = np.asarray(raw_imgs, np.float32)[:, :h0, :w0]
    masks = None if masks is None else np.asarray(masks, np.float32)[:, :h0, :w0]
    x = x[:, :h0, :w0]

    for j in range(num_style):
        out_j = (outputs[j:j + 1] + 1.0) / 2.0  # test.py:112
        save_image(out_j, os.path.join(opts.output_folder, f"output{j:03d}.jpg"),
                   nrow=1, normalize=True)
        if masks is not None:  # _mask and raw _img variants (test.py:115-123)
            save_image(np.repeat(masks[j:j + 1], 3, axis=-1),
                       os.path.join(opts.output_folder, f"output{j:03d}_mask.jpg"),
                       nrow=1, normalize=True)
            save_image(raw_imgs[j:j + 1],
                       os.path.join(opts.output_folder, f"output{j:03d}_img.jpg"),
                       nrow=1, normalize=True)
    if not opts.output_only:
        save_image(np.asarray(x), os.path.join(opts.output_folder, "input.jpg"),
                   nrow=1, normalize=True)
    print(f"Wrote {num_style} style outputs to {opts.output_folder}")


if __name__ == "__main__":
    main()
