"""Generate a tiny two-domain JPEG dataset for end-to-end training runs.

The reference's implied workload is CelebA male2female
(/root/reference/configs/male2female.yaml:58-65 — a data_root with
trainA/trainB/testA/testB folders of JPEGs). That dataset cannot be fetched
in a zero-egress image, so this script synthesizes a *learnable* stand-in
with the same folder layout and file format: procedural "face-like" scenes
where domain A and domain B differ by a consistent, translatable attribute
(cool skin tone + no lips vs warm skin tone + red lips), while identity
factors (position, scale, background) vary per sample. A focus-mask GAN can
learn the A->B mapping as a localized edit, which is exactly ACL-GAN's
setting.

    python tools/make_dataset.py --out /tmp/aclgan_ds --n 200 --size 286
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image, ImageDraw


def _scene(rng: np.ndarray, size: int, domain: str) -> Image.Image:
    """One procedural portrait: background gradient + head ellipse + eyes +
    mouth. Domain A: cool skin, thin dark mouth. Domain B: warm skin, red
    lips. Everything else (pose, background) is shared identity variation."""
    r = rng
    # background: two-color vertical gradient
    c0 = r.randint(30, 220, 3)
    c1 = r.randint(30, 220, 3)
    t = np.linspace(0.0, 1.0, size)[:, None, None]
    bg = (c0[None, None] * (1 - t) + c1[None, None] * t).astype(np.uint8)
    img = Image.fromarray(np.broadcast_to(bg, (size, size, 3)).copy())
    draw = ImageDraw.Draw(img)

    cx = size // 2 + r.randint(-size // 8, size // 8)
    cy = size // 2 + r.randint(-size // 8, size // 8)
    rx = r.randint(size // 5, size // 3)
    ry = int(rx * (1.15 + 0.2 * r.rand()))

    if domain == "A":
        skin = (int(150 + 40 * r.rand()), int(170 + 40 * r.rand()),
                int(190 + 50 * r.rand()))          # cool/bluish
    else:
        skin = (int(220 + 30 * r.rand()), int(160 + 40 * r.rand()),
                int(120 + 40 * r.rand()))          # warm/orange
    draw.ellipse((cx - rx, cy - ry, cx + rx, cy + ry), fill=skin)

    # eyes (shared across domains)
    ex = rx // 2
    ey = ry // 3
    er = max(2, rx // 8)
    for sx in (-1, 1):
        draw.ellipse((cx + sx * ex - er, cy - ey - er,
                      cx + sx * ex + er, cy - ey + er), fill=(20, 20, 30))

    # mouth: the translatable attribute
    my = cy + ry // 2
    mw = rx // 2 + r.randint(0, rx // 4)
    if domain == "A":
        mh = max(2, ry // 20)
        draw.ellipse((cx - mw, my - mh, cx + mw, my + mh), fill=(60, 30, 40))
    else:
        mh = max(4, ry // 8)
        draw.ellipse((cx - mw, my - mh, cx + mw, my + mh), fill=(200, 30, 60))
    return img


def make(out: str, n: int, size: int, n_test: int, seed: int, quality: int):
    for sub, domain, count, base_seed in (
        ("trainA", "A", n, 0), ("trainB", "B", n, 10_000),
        ("testA", "A", n_test, 20_000), ("testB", "B", n_test, 30_000),
    ):
        folder = os.path.join(out, sub)
        os.makedirs(folder, exist_ok=True)
        for i in range(count):
            rng = np.random.RandomState(seed + base_seed + i)
            img = _scene(rng, size, domain)
            img.save(os.path.join(folder, f"{i:05d}.jpg"), quality=quality)
    print(f"wrote {2 * n} train + {2 * n_test} test JPEGs ({size}x{size}) "
          f"under {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=200, help="images per train domain")
    p.add_argument("--n_test", type=int, default=16)
    p.add_argument("--size", type=int, default=286)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quality", type=int, default=92)
    args = p.parse_args()
    make(args.out, args.n, args.size, args.n_test, args.seed, args.quality)


if __name__ == "__main__":
    main()
