"""Batch inference + IS/CIS CLI — the reference's test_batch.py *as intended*.

The committed reference file cannot run (SyntaxError at test_batch.py:72);
this implements its documented intent (SURVEY §2.9/§3.4): for every image in
--input_folder (cap 3000), per style j produce
  bar = Dab(Gab(x))        — translation (saved, + mask),
  hat = Dba(Gba(bar))      — cycle back (computed; saving off by default,
                             mirroring the commented-out saves at :176-178),
  til = Dba(Gba(x))        — in-domain translation,
with styles drawn at 2x scale (test_batch.py:105,117 — load-bearing for eval
parity), --synchronized reusing one fixed style triple across images.
Optionally accumulates inception softmax predictions for IS / conditional IS
(test_batch.py:186-206) via the JAX InceptionV3 evaluator.

TPU-native difference: images are processed in jitted batches, not one-by-one.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache
from aclgan_tpu import losses as L
from aclgan_tpu.config import load_config
from aclgan_tpu.data.dataset import list_images_folder
from aclgan_tpu.data.loader import DataLoader, ImageDataset
from aclgan_tpu.data.transforms import TransformSpec
from aclgan_tpu.trainer import ACLGAN
from aclgan_tpu.utils.backend import bound_transfer_journal
from aclgan_tpu.utils.image import save_image


_enable_compile_cache()
bound_transfer_journal()  # per-image H2D over a whole dataset (backend.py)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, help="Path to the config file.")
    parser.add_argument("--input_folder", type=str, help="input image folder")
    parser.add_argument("--output_folder", type=str, help="output image folder")
    parser.add_argument("--checkpoint", type=str, help="checkpoint of autoencoders")
    parser.add_argument("--a2b", type=int, default=1)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--num_style", type=int, default=1)
    parser.add_argument("--synchronized", action="store_true")
    parser.add_argument("--output_only", action="store_true")
    parser.add_argument("--output_path", type=str, default=".")
    parser.add_argument("--trainer", type=str, default="aclgan")
    parser.add_argument("--compute_IS", action="store_true")
    parser.add_argument("--compute_CIS", action="store_true")
    parser.add_argument("--compute_FID", action="store_true",
                        help="FID of translated outputs vs --fid_real_folder "
                             "(no reference analog; BASELINE.md names FID "
                             "parity as the quality target)")
    parser.add_argument("--fid_real_folder", type=str, default=None,
                        help="folder of real target-domain images for FID")
    parser.add_argument("--inception_a", type=str, default=".")
    parser.add_argument("--inception_b", type=str, default=".")
    parser.add_argument("--inception_weights", type=str, default=None,
                        help="inception weights for FID features (torch .pt)")
    parser.add_argument("--batch", type=int, default=8,
                        help="device batch (no reference analog; it used 1)")
    parser.add_argument("--save_all", action="store_true",
                        help="also save hat/til/ori (commented out in the reference)")
    parser.add_argument("--max_images", type=int, default=3000)
    opts = parser.parse_args(argv)

    if opts.trainer != "aclgan":
        sys.exit("Only support aclgan")

    cfg = load_config(opts.config)
    model = ACLGAN(cfg)
    from aclgan_tpu.cli.test import load_generator_params

    gen_params = load_generator_params(opts.checkpoint, model)

    inception = None
    if opts.compute_IS or opts.compute_CIS:
        from aclgan_tpu.eval.inception import InceptionScorer

        ckpt = opts.inception_b if opts.a2b else opts.inception_a
        if ckpt in (".", "", None) and opts.inception_weights:
            ckpt = opts.inception_weights  # one fine-tuned classifier for all
        inception = InceptionScorer(ckpt)
        if not inception.pretrained:
            print("WARNING: IS/CIS with a randomly-initialized inception "
                  "classifier (no loadable --inception_a/b weights) — the "
                  "printed scores are numerically meaningless")
    fid_scorer = None
    fake_feats = []
    if opts.compute_FID:
        from aclgan_tpu.eval.inception import InceptionScorer

        if not opts.fid_real_folder:
            # validate BEFORE the (potentially hours-long) translation loop
            sys.exit("--compute_FID requires --fid_real_folder")
        fid_scorer = InceptionScorer(opts.inception_weights)
        if not fid_scorer.pretrained:
            print("WARNING: FID with randomly-initialized inception features "
                  "(no --inception_weights given) — relative values only")

    if opts.batch < 1:
        sys.exit("--batch must be >= 1")
    size_a, size_b = cfg.data.resolved_sizes()
    new_size = size_a if opts.a2b else size_b
    if new_size is None:
        # batching needs a fixed shape; all-None TransformSpec would produce
        # ragged arrays and an opaque np.stack error
        sys.exit("config must set new_size (or new_size_a/new_size_b for "
                 "this direction) for batched translation")
    paths = list_images_folder(opts.input_folder)[:opts.max_images]
    if not paths:
        sys.exit(f"no images found in --input_folder {opts.input_folder}")
    # resize shortest side, center-crop to square so batching is possible
    spec = TransformSpec(new_size=new_size, crop_h=new_size, crop_w=new_size, flip=False)
    ds = ImageDataset(paths, spec)
    loader = DataLoader(ds, batch_size=min(opts.batch, len(paths)), train=False,
                        num_workers=4, seed=opts.seed)
    key = jax.random.PRNGKey(opts.seed)
    sd = cfg.gen.style_dim
    # fixed style triple set at 2x scale (test_batch.py:105,117).
    # k0 is the split's SECOND output so --synchronized --seed N reproduces
    # the style triples of earlier releases (which did `key, k0 = split`).
    k1, k0 = jax.random.split(key)
    style_fixed = 2.0 * jax.random.normal(k0, (opts.num_style * 3, sd))
    # unsynchronized mode: pre-draw EVERY batch's style triples in one device
    # call — a per-(batch, style) host-side jax.random.split would add a
    # cross-executable dependency per dispatch, which stalls ~0.5 s each on
    # the axon backend (BENCH_NOTES "measurement caveat")
    style_rand = None
    if not opts.synchronized:
        n_batches = -(-len(paths) // min(opts.batch, len(paths)))
        style_rand = np.asarray(
            2.0 * jax.random.normal(k1, (n_batches, opts.num_style, 3, sd)),
            np.float32)

    a2b = bool(opts.a2b)
    keyAB = "AB" if a2b else "BA"

    @jax.jit
    def translate_triplet(params, x, s1, s2, s3):
        """bar/hat/til for one style triple, batched over images."""
        dt = model.dtype
        x = x.astype(dt)
        c_ab, _ = model.gen_encode(params[keyAB], x)      # Gab
        c_til, _ = model.gen_encode(params["BA"], x)      # Gba (test_batch.py:116)

        def dec(p, c, s):
            out = model.gen_decode(p, c, jnp.broadcast_to(s[None], (c.shape[0], sd)).astype(dt))
            return model._split_img_mask(out)

        bar_raw, bar_mask = dec(params[keyAB], c_ab, s1)
        bar = (L.focus_translation_eval(bar_raw, x, bar_mask)
               if bar_mask is not None else bar_raw)
        c_hat, _ = model.gen_encode(params["BA"], bar)
        hat_raw, hat_mask = dec(params["BA"], c_hat, s2)
        hat = (L.focus_translation_eval(hat_raw, bar, hat_mask)
               if hat_mask is not None else hat_raw)
        til_raw, til_mask = dec(params["BA"], c_til, s3)
        til = (L.focus_translation_eval(til_raw, x, til_mask)
               if til_mask is not None else til_raw)
        return bar, bar_mask, hat, til

    all_preds = []
    IS, CIS = [], []
    img_idx = 0
    batch_idx = 0
    # iter_padded: every input contributes (the reference's batch-1 loop
    # processes all images; a drop-last loader would silently skip the tail)
    for batch, n_valid in loader.iter_padded():
        x = jnp.asarray(batch)
        names = [os.path.basename(p) for p in
                 paths[img_idx:img_idx + n_valid]]
        cur_preds = []
        for j in range(opts.num_style):
            if opts.synchronized:
                s1, s2, s3 = (style_fixed[j * 3 + k] for k in range(3))
            else:
                sj = style_rand[batch_idx, j]
                s1, s2, s3 = sj[0], sj[1], sj[2]
            bar, bar_mask, hat, til = translate_triplet(gen_params, x, s1, s2, s3)
            bar01 = (np.asarray(bar, np.float32) + 1.0) / 2.0
            if fid_scorer is not None and j == 0:
                fake_feats.append(fid_scorer.features(bar01)[:n_valid])
            if inception is not None:
                pred = inception.predict(bar01)[:n_valid]  # (B, classes) softmax
                if opts.compute_IS:
                    all_preds.append(pred)
                if opts.compute_CIS:
                    cur_preds.append(pred)
            for bi, name in enumerate(names):
                save_image(bar01[bi:bi + 1],
                           os.path.join(opts.output_folder, f"_{j:02d}_bar", name),
                           nrow=1, normalize=True)
                if bar_mask is not None:
                    m = np.repeat(np.asarray(bar_mask, np.float32)[bi:bi + 1], 3, -1)
                    save_image(m, os.path.join(opts.output_folder, f"_{j:02d}_mask", name),
                               nrow=1, normalize=True)
                if opts.save_all:
                    save_image((np.asarray(hat, np.float32)[bi:bi + 1] + 1) / 2,
                               os.path.join(opts.output_folder, f"_{j:02d}_hat", name),
                               nrow=1, normalize=True)
                    save_image((np.asarray(til, np.float32)[bi:bi + 1] + 1) / 2,
                               os.path.join(opts.output_folder, f"_{j:02d}_til", name),
                               nrow=1, normalize=True)
        if opts.compute_CIS and cur_preds:
            # per-input prior over its own styles (test_batch.py:186-191)
            from scipy.stats import entropy

            cur = np.stack(cur_preds, 0)  # (num_style, B, C)
            for bi in range(cur.shape[1]):
                py = cur[:, bi].sum(axis=0)
                for js in range(cur.shape[0]):
                    CIS.append(entropy(cur[js, bi], py))
        if not opts.output_only:
            for bi in range(n_valid):
                save_image(np.asarray(x)[bi:bi + 1],
                           os.path.join(opts.output_folder, f"input{img_idx + bi:03d}.jpg"),
                           nrow=1, normalize=True)
        img_idx += n_valid
        batch_idx += 1
        print(f"{img_idx}/{len(paths)}")

    if opts.compute_IS and all_preds:
        from scipy.stats import entropy

        preds = np.concatenate(all_preds, 0)
        py = preds.sum(axis=0)  # prior from all outputs (test_batch.py:197-201)
        IS = [entropy(preds[j], py) for j in range(preds.shape[0])]
        print("Inception Score: {}".format(np.exp(np.mean(IS))))
        if preds.shape[1] == 2:
            # two-domain fine-tuned classifier (the reference's protocol,
            # utils.py:239-248): also report how many translations land in
            # the target domain — with a saturated binary classifier IS
            # degenerates to 1.0 precisely when this rate is 0 or 1
            rate = float(np.mean(np.argmax(preds, -1) == (1 if a2b else 0)))
            print(f"Target-domain classification rate: {rate:.4f}")
    if opts.compute_CIS and CIS:
        print("conditional Inception Score: {}".format(np.exp(np.mean(CIS))))
    if fid_scorer is not None:  # --fid_real_folder validated at startup
        from aclgan_tpu.eval.fid import feature_stats, frechet_distance

        real_paths = list_images_folder(opts.fid_real_folder)[:opts.max_images]
        real_ds = ImageDataset(real_paths, spec)
        real_loader = DataLoader(real_ds, batch_size=min(opts.batch, len(real_paths)),
                                 train=False, num_workers=4, seed=opts.seed)
        real_feats = [fid_scorer.features((b + 1.0) / 2.0)[:n]
                      for b, n in real_loader.iter_padded()]
        fid = frechet_distance(*feature_stats(np.concatenate(real_feats, 0)),
                               *feature_stats(np.concatenate(fake_feats, 0)))
        print("FID: {:.4f}".format(fid))


if __name__ == "__main__":
    main()
