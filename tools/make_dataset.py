"""Generate a two-domain JPEG dataset for end-to-end training runs.

The reference's implied workload is CelebA male2female
(/root/reference/configs/male2female.yaml:58-65 — a data_root with
trainA/trainB/testA/testB folders of JPEGs). That dataset cannot be fetched
in a zero-egress image, so this script synthesizes a *learnable* stand-in
with the same folder layout and file format: procedural "face-like" scenes
where domain A and domain B differ by a consistent, translatable attribute
bundle, while identity factors vary per sample. A focus-mask GAN can learn
the A->B mapping as a localized edit, which is exactly ACL-GAN's setting.

Two difficulty levels (`--style`):

- `simple` (the round-2/3 task): cool skin + thin mouth vs warm skin + red
  lips on a plain gradient background. Diagnosed in VERDICT r3 as too easy —
  the FID curve rode estimator noise (values down to 1.28) because the
  domain gap is a global recolor a GAN nails early.
- `hard` (round 4): the domain attribute is a *structured multi-region
  bundle* — hairstyle (short dark cap vs long bright hair that changes the
  silhouette), eyebrow shape (straight bars vs arched arcs), and mouth
  (thin dark vs full red) — while skin tone, textured backgrounds
  (stripes / checker / gradient), clothing texture (dots / stripes),
  glasses, and skin speckle are identity factors SHARED across domains that
  must be preserved. The translation needs several coordinated localized
  edits plus a silhouette change, and the high-frequency textures give the
  inception pool3 features something to discriminate — so snapshot-to-
  snapshot FID differences are model signal, not estimator noise.

    python tools/make_dataset.py --out /tmp/aclgan_hard --style hard \\
        --n 2000 --n_test 500 --size 286
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


def _textured_background(r: np.ndarray, size: int) -> np.ndarray:
    """Identity-factor background: gradient, stripes, or checker (uint8 HWC)."""
    kind = r.randint(3)
    c0 = r.randint(30, 220, 3).astype(np.float32)
    c1 = r.randint(30, 220, 3).astype(np.float32)
    if kind == 0:  # two-color gradient at a random angle
        t = np.linspace(0.0, 1.0, size, dtype=np.float32)
        ang = r.rand() * np.pi
        g = (np.cos(ang) * t[:, None] + np.sin(ang) * t[None, :])
        g = (g - g.min()) / max(g.max() - g.min(), 1e-6)
        bg = c0[None, None] * (1 - g[..., None]) + c1[None, None] * g[..., None]
    elif kind == 1:  # stripes at a random angle / frequency
        freq = r.uniform(4.0, 14.0)
        ang = r.rand() * np.pi
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        phase = np.sin(2 * np.pi * freq * (np.cos(ang) * yy + np.sin(ang) * xx))
        m = (phase > 0).astype(np.float32)[..., None]
        bg = c0[None, None] * m + c1[None, None] * (1 - m)
    else:  # checkerboard
        cell = r.randint(size // 16, size // 6)
        yy, xx = np.mgrid[0:size, 0:size]
        m = (((yy // cell) + (xx // cell)) % 2).astype(np.float32)[..., None]
        bg = c0[None, None] * m + c1[None, None] * (1 - m)
    return np.clip(bg, 0, 255).astype(np.uint8)


def _scene_hard(rng: np.ndarray, size: int, domain: str) -> Image.Image:
    """One structured portrait (see module docstring, `hard` mode).

    Shared identity factors: textured background, skin tone + speckle,
    clothing color/texture, pose/scale, optional glasses.
    Domain bundle: hairstyle + silhouette, eyebrow shape, mouth."""
    r = rng
    img = Image.fromarray(_textured_background(r, size))
    draw = ImageDraw.Draw(img)

    cx = size // 2 + r.randint(-size // 10, size // 10)
    cy = size // 2 + r.randint(-size // 12, size // 12)
    rx = r.randint(size // 5, size // 4)
    ry = int(rx * (1.2 + 0.2 * r.rand()))

    # clothing: rectangle from the neck down, random color + texture (shared)
    cloth = tuple(int(v) for v in r.randint(40, 215, 3))
    neck_y = cy + ry - ry // 6
    draw.rectangle((cx - 2 * rx, neck_y + ry // 3, cx + 2 * rx, size), fill=cloth)
    accent = tuple(int(v) for v in r.randint(20, 235, 3))
    if r.rand() < 0.5:  # dots
        step = max(8, size // 18)
        rad = max(2, step // 4)
        for yy in range(neck_y + ry // 3 + step // 2, size, step):
            for xx in range(cx - 2 * rx + step // 2, cx + 2 * rx, step):
                draw.ellipse((xx - rad, yy - rad, xx + rad, yy + rad), fill=accent)
    else:  # stripes
        step = max(6, size // 20)
        for yy in range(neck_y + ry // 3, size, 2 * step):
            draw.rectangle((cx - 2 * rx, yy, cx + 2 * rx, yy + step), fill=accent)

    # skin tone: SHARED distribution (tan range) — recoloring is not the task
    skin = (int(185 + 50 * r.rand()), int(140 + 45 * r.rand()),
            int(100 + 45 * r.rand()))
    draw.ellipse((cx - rx, cy - ry, cx + rx, cy + ry), fill=skin)

    # hair: THE silhouette-changing domain attribute
    if domain == "A":
        # short dark cap hugging the top of the head
        hair = (int(20 + 40 * r.rand()), int(15 + 30 * r.rand()),
                int(10 + 30 * r.rand()))
        pad = max(2, rx // 10)
        draw.pieslice((cx - rx - pad, cy - ry - pad, cx + rx + pad,
                       cy + ry + pad), 180, 360, fill=hair)
        # re-expose the forehead so the cap reads as hair, not a bigger head
        draw.ellipse((cx - rx + pad, cy - ry + 3 * pad, cx + rx - pad,
                      cy + ry), fill=skin)
    else:
        # long bright hair: top arc + two side falls reaching the shoulders
        hue = r.rand()
        if hue < 0.5:   # blonde
            hair = (int(215 + 30 * r.rand()), int(175 + 40 * r.rand()),
                    int(60 + 50 * r.rand()))
        else:           # auburn/red
            hair = (int(150 + 60 * r.rand()), int(40 + 40 * r.rand()),
                    int(20 + 30 * r.rand()))
        pad = max(2, rx // 8)
        fall = int(ry * (1.3 + 0.5 * r.rand()))
        wside = rx // 2 + pad
        draw.pieslice((cx - rx - pad, cy - ry - pad, cx + rx + pad,
                       cy + ry + pad), 180, 360, fill=hair)
        draw.rectangle((cx - rx - pad, cy - ry // 4, cx - rx + wside // 2,
                        cy + fall), fill=hair)
        draw.rectangle((cx + rx - wside // 2, cy - ry // 4, cx + rx + pad,
                        cy + fall), fill=hair)
        draw.ellipse((cx - rx + pad, cy - ry + 3 * pad, cx + rx - pad,
                      cy + ry), fill=skin)

    # eyes (shared)
    ex, ey = rx // 2, ry // 4
    er = max(2, rx // 8)
    for sx in (-1, 1):
        draw.ellipse((cx + sx * ex - er, cy - ey - er,
                      cx + sx * ex + er, cy - ey + er), fill=(20, 20, 30))

    # eyebrows: domain-dependent shape, shared dark color
    brow = (30, 22, 18)
    by = cy - ey - 2 * er
    bw = er + er // 2
    if domain == "A":   # thick straight bars
        bh = max(2, er // 2)
        for sx in (-1, 1):
            draw.rectangle((cx + sx * ex - bw, by - bh,
                            cx + sx * ex + bw, by + bh), fill=brow)
    else:               # thin arched arcs
        for sx in (-1, 1):
            draw.arc((cx + sx * ex - bw, by - er, cx + sx * ex + bw, by + er),
                     200, 340, fill=brow, width=max(2, er // 3))

    # mouth: domain-dependent
    my = cy + ry // 2
    mw = rx // 2 + r.randint(0, rx // 4)
    if domain == "A":
        mh = max(2, ry // 22)
        draw.ellipse((cx - mw, my - mh, cx + mw, my + mh), fill=(60, 30, 40))
    else:
        mh = max(4, ry // 8)
        draw.ellipse((cx - mw, my - mh, cx + mw, my + mh), fill=(200, 30, 60))

    # glasses: identity factor on ~30% of BOTH domains — must be preserved
    if r.rand() < 0.3:
        gr = er + max(2, er // 2)
        gc = (15, 15, 20)
        w = max(2, er // 3)
        for sx in (-1, 1):
            draw.ellipse((cx + sx * ex - gr, cy - ey - gr,
                          cx + sx * ex + gr, cy - ey + gr), outline=gc, width=w)
        draw.line((cx - ex + gr, cy - ey, cx + ex - gr, cy - ey), fill=gc, width=w)

    # skin speckle: shared high-frequency texture (gives pool3 features
    # fine-grained content so FID discriminates fidelity, not just color)
    arr = np.asarray(img).astype(np.int16)
    noise = r.randint(-14, 15, arr.shape[:2])[..., None]
    yy, xx = np.mgrid[0:size, 0:size]
    inside = (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2) < 1.0
    arr += (noise * inside[..., None]).astype(np.int16)
    return Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))


_SCENES = {"simple": _scene, "hard": _scene_hard}


def make(out: str, n: int, size: int, n_test: int, seed: int, quality: int,
         style: str = "simple"):
    scene = _SCENES[style]
    for sub, domain, count, base_seed in (
        ("trainA", "A", n, 0), ("trainB", "B", n, 10_000),
        ("testA", "A", n_test, 20_000), ("testB", "B", n_test, 30_000),
    ):
        folder = os.path.join(out, sub)
        os.makedirs(folder, exist_ok=True)
        for i in range(count):
            rng = np.random.RandomState(seed + base_seed + i)
            img = scene(rng, size, domain)
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
    p.add_argument("--style", default="simple", choices=sorted(_SCENES),
                   help="simple = round-2/3 recolor task; hard = structured "
                        "multi-region attribute bundle (round 4)")
    args = p.parse_args()
    make(args.out, args.n, args.size, args.n_test, args.seed, args.quality,
         args.style)


if __name__ == "__main__":
    main()
