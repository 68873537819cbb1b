"""FID / target-domain-rate curve across every retained snapshot.

The snapshot-selection workflow (VERDICT r2 item 4): GAN FID is not monotonic
in training time (RUNLOG "FID non-monotonicity"), so quality is reported as a
curve over the run's retained snapshots and the best snapshot is selected
from it — the workflow the reference's every-N-iter snapshot scheme
(trainer.py:324-331) exists to support.

One process loads the model/inception once and sweeps the snapshots, so the
cost is ~seconds per snapshot instead of a CLI startup (85 s axon
registration) each. Protocol matches cli/test_batch.py: synchronized style at
2x scale (test_batch.py:105), eval-space blend, FID over pool3 features of
translated testA vs real testB.

    python tools/fid_curve.py --config configs/synthfaces2k.yaml \
        --run_dir /tmp/aclgan_run2k/outputs/synthfaces2k \
        --inception_weights /tmp/inception2k.msgpack --n 500

Writes <run_dir>/fid_curve_<prefix>.json (gen and ema sweeps of the same run
don't clobber each other) and prints a markdown table. --styles K scores K
synchronized style draws per snapshot (mean FID + spread); --bootstrap B adds
a 95% CI from B fake-feature resamples.

CI method (reworked per ADVICE r4): each resample redraws the fake features
*per style* with replacement and averages the K per-style FIDs — the same
estimand as the reported point FID, not a single-style proxy. The per-resample
linear algebra runs on the device in f32 via the symmetric-eigh identity
tr sqrtm(S1 S2) = sum sqrt eig(sqrt(S1) S2 sqrt(S1)) (scipy's f64 Schur sqrtm
is minutes per 2048^2 call on this 1-core host); at 2048 dims the f32 eigen
spectrum carries systematic error comparable to the CI width, so the interval
is a *recentered (basic) bootstrap* anchored at the f32 no-resample point and
then shifted to the reported f64 point FID — the shared f32 formulation error
cancels between anchor and resamples. The residual f32-vs-f64 discrepancy is
recorded per row as `fid_f32_minus_f64` and warned about if it exceeds half
the CI width. The lower bound is clipped at 0 (FID is non-negative).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aclgan_tpu.utils.backend import bound_transfer_journal

bound_transfer_journal()  # sweep ships ~n*styles images/snapshot (backend.py)

import numpy as np

import jax
import jax.numpy as jnp

from aclgan_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()  # repo-local persistent cache; survives /tmp wipes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--run_dir", required=True,
                   help="outputs/<name> dir containing checkpoints/")
    p.add_argument("--inception_weights", required=True)
    p.add_argument("--n", type=int, default=500, help="images per side")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--a2b", type=int, default=1)
    p.add_argument("--prefix", default="gen", choices=("gen", "ema"),
                   help="snapshot family to sweep: live weights (gen_*) or "
                        "EMA weights (ema_*, tpu.ema_decay runs)")
    p.add_argument("--styles", type=int, default=1,
                   help="style seeds per snapshot; >1 reports per-style FIDs "
                        "+ spread so adjacent-snapshot differences can be "
                        "read against style-draw noise (VERDICT r3 item 4)")
    p.add_argument("--bootstrap", type=int, default=0,
                   help="bootstrap resamples of the fake features for a "
                        "95%% CI per snapshot (each resample pays a 2048^2 "
                        "sqrtm on this 1-core host — use sparingly)")
    p.add_argument("--start_after", type=int, default=0,
                   help="skip snapshots with iteration <= this: resume an "
                        "interrupted sweep (rows land in the same output "
                        "file, merged with any rows already there)")
    args = p.parse_args()

    from aclgan_tpu.config import load_config
    from aclgan_tpu.data.dataset import list_images_folder
    from aclgan_tpu.data.loader import DataLoader, ImageDataset
    from aclgan_tpu.data.transforms import TransformSpec
    from aclgan_tpu.eval.fid import feature_stats, frechet_distance
    from aclgan_tpu.eval.inception import InceptionScorer
    from aclgan_tpu.trainer import ACLGAN
    from aclgan_tpu.utils.checkpoint import load_gen_params, parse_iteration

    cfg = load_config(args.config)
    model = ACLGAN(cfg)
    a2b = bool(args.a2b)
    scorer = InceptionScorer(args.inception_weights)
    assert scorer.pretrained, "need fine-tuned inception weights for real FID"

    size_a, size_b = cfg.data.resolved_sizes()
    new_size = size_a if a2b else size_b
    spec = TransformSpec(new_size=new_size, crop_h=new_size, crop_w=new_size,
                         flip=False)
    src = os.path.join(cfg.data.data_root, "testA" if a2b else "testB")
    dst = os.path.join(cfg.data.data_root, "testB" if a2b else "testA")
    src_paths = list_images_folder(src)[:args.n]
    dst_paths = list_images_folder(dst)[:args.n]
    print(f"{len(src_paths)} source / {len(dst_paths)} real target images")

    def loader(paths):
        ds = ImageDataset(paths, spec)
        return DataLoader(ds, batch_size=min(args.batch, len(paths)),
                          train=False, num_workers=2, seed=args.seed)

    # real-side stats once
    real_feats = [scorer.features((b + 1.0) / 2.0)[:n]
                  for b, n in loader(dst_paths).iter_padded()]
    mu_r, sig_r = feature_stats(np.concatenate(real_feats, 0))

    # synchronized fixed style(s) at 2x scale (test_batch.py:105; the first
    # is k0 = second split output, matching cli/test_batch.py's stream;
    # further styles continue the same key chain)
    kk = jax.random.PRNGKey(args.seed)
    styles = []
    for _ in range(max(1, args.styles)):
        kk, k0 = jax.random.split(kk)
        styles.append(2.0 * jax.random.normal(k0, (cfg.gen.style_dim,)))

    @jax.jit
    def translate(params, x, s):
        # the shipped eval path (encode -> decode -> eval-space blend), so the
        # snapshot-selection FID can never diverge from what cli/test* serve
        img, _ = model.translate(
            params, x,
            jnp.broadcast_to(s[None], (x.shape[0], cfg.gen.style_dim)),
            a2b=a2b, eval_blend=True)
        return img

    # --bootstrap machinery: per-resample scipy sqrtm (Schur, ~minutes at
    # 2048^2 on this 1-core host) is unaffordable, so resamples use the
    # symmetric-eigh identity tr sqrtm(S1 S2) = sum sqrt eig(sqrt(S1) S2
    # sqrt(S1)) with all linear algebra jitted on the device. sqrt(S_real) is
    # computed once; each resample is two 2048^3 matmuls + one eigvalsh per
    # style (vmapped over the K styles — same estimand as the point FID).
    if args.bootstrap:
        ev_r, vec_r = np.linalg.eigh(sig_r.astype(np.float64))
        sqrt_sr = jnp.asarray(
            (vec_r * np.sqrt(np.clip(ev_r, 0.0, None))) @ vec_r.T,
            jnp.float32)
        mu_r_dev = jnp.asarray(mu_r, jnp.float32)
        tr_sr = float(np.trace(sig_r))

        def _fid32(x):
            mu_f = x.mean(0)
            xc = x - mu_f
            sig_f = (xc.T @ xc) / (x.shape[0] - 1)
            m = sqrt_sr @ sig_f @ sqrt_sr
            ev = jnp.clip(jnp.linalg.eigvalsh(m), 0.0, None)
            d = mu_r_dev - mu_f
            return (d @ d + tr_sr + jnp.trace(sig_f)
                    - 2.0 * jnp.sum(jnp.sqrt(ev)))

        @jax.jit
        def _point_fid32(feats_all):  # (K, n, 2048) -> f32 anchor (K-mean)
            return jnp.mean(jax.vmap(_fid32)(feats_all))

        @jax.jit
        def _boot_fid(feats_all, key):  # one resample of the K-mean FID
            def one(feats, k):
                n = feats.shape[0]
                idx = jax.random.randint(k, (n,), 0, n)
                return _fid32(feats[idx])
            keys = jax.random.split(key, feats_all.shape[0])
            return jnp.mean(jax.vmap(one)(feats_all, keys))

    template = model.init_state(jax.random.PRNGKey(0)).gen_params
    snaps = sorted(glob.glob(os.path.join(args.run_dir, "checkpoints",
                                          args.prefix + "_*.msgpack")))
    snaps = [s for s in snaps
             if not os.path.islink(s)  # e.g. a convenience alias snapshot
             and parse_iteration(s) > args.start_after]
    if not snaps:
        sys.exit(f"no {args.prefix} snapshots under {args.run_dir}/checkpoints")

    # a sweep can be interrupted (timeout, OOM, pool outage) — write the
    # file after every row and merge with rows from a previous partial run.
    # Merge only if the prior run used the SAME protocol/knobs: FID is
    # strongly n-biased and the CI method changed once already, so silently
    # mixing rows computed under different flags would corrupt `best` and the
    # top-level metadata (ADVICE r4).
    protocol = "synchronized 2x style, eval blend, pool3 FID"
    ci_method = ("per-style resample, recentered basic bootstrap, "
                 "f32-eigh anchored to f64 point" if args.bootstrap else None)
    meta = {"n": args.n, "styles": len(styles), "bootstrap": args.bootstrap,
            "prefix": args.prefix, "protocol": protocol, "ci": ci_method}
    out_path = os.path.join(args.run_dir, f"fid_curve_{args.prefix}.json")
    rows = []
    if args.start_after and os.path.exists(out_path):
        with open(out_path) as f:
            prior_doc = json.load(f)
        got = {k: prior_doc.get(k) for k in meta}
        if got != meta:
            diffs = {k: (got[k], meta[k]) for k in meta if got[k] != meta[k]}
            sys.exit(f"--start_after merge refused: the prior run's protocol "
                     f"differs (prior vs current): {diffs}. Re-run with "
                     f"matching flags, or delete {out_path} to start over.")
        rows = [r for r in prior_doc.get("rows", [])
                if r["iteration"] <= args.start_after]
        print(f"merged {len(rows)} prior rows from {out_path}")

    def write_out(complete):
        best = min(rows, key=lambda r: r["fid"])
        out = {"rows": rows, "best": best, **meta, "complete": complete}
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)

    for snap in snaps:
        it = parse_iteration(snap)
        params = jax.tree_util.tree_map(jnp.asarray,
                                        load_gen_params(snap, template))
        fids, rates, style_feats = [], [], []
        for style in styles:
            feats = []
            for b, n in loader(src_paths).iter_padded():
                img01 = (np.asarray(translate(params, jnp.asarray(b), style),
                                    np.float32) + 1.0) / 2.0
                feats.append(scorer.features(img01)[:n])
                pred = scorer.predict(img01)[:n]
                if pred.shape[1] == 2:
                    rates.append(np.argmax(pred, -1) == (1 if a2b else 0))
            feats = np.concatenate(feats, 0)
            style_feats.append(feats)
            mu_f, sig_f = feature_stats(feats)
            fids.append(float(frechet_distance(mu_r, sig_r, mu_f, sig_f)))
        fid = float(np.mean(fids))  # == the single FID when --styles 1
        rate = float(np.mean(np.concatenate(rates))) if rates else float("nan")
        row = {"iteration": it, "fid": round(fid, 3),
               "target_domain_rate": round(rate, 4),
               "n_fake": int(len(style_feats[0])),
               "n_real": int(sum(len(f) for f in real_feats))}
        if len(styles) > 1:
            row["fid_styles"] = [round(f, 3) for f in fids]
            row["fid_spread"] = round(max(fids) - min(fids), 3)
        if args.bootstrap:
            feats_dev = jnp.asarray(np.stack(style_feats), jnp.float32)
            point32 = float(_point_fid32(feats_dev))  # f32 anchor, same K-mean
            kb = jax.random.PRNGKey(args.seed + 17)
            samples = []
            for _ in range(args.bootstrap):
                kb, kr = jax.random.split(kb)
                samples.append(float(_boot_fid(feats_dev, kr)))
            q_lo, q_hi = np.percentile(samples, [2.5, 97.5])
            # recentered (basic) bootstrap around the f32 anchor, shifted to
            # the f64 point FID: the f32 formulation error, shared between
            # anchor and resamples, cancels (module docstring).
            lo = max(0.0, fid + (point32 - float(q_hi)))
            hi = max(0.0, fid + (point32 - float(q_lo)))
            row["fid_ci95"] = [round(lo, 3), round(hi, 3)]
            row["fid_f32_minus_f64"] = round(point32 - fid, 3)
            if abs(point32 - fid) > 0.5 * max(hi - lo, 1e-6):
                print(f"WARNING iter {it}: f32-eigh point FID {point32:.3f} "
                      f"deviates from f64 scipy {fid:.3f} by more than half "
                      f"the CI width — treat this row's CI as approximate",
                      flush=True)
        rows.append(row)
        write_out(complete=False)
        extra = ""
        if "fid_spread" in row:
            extra += f"  styles {row['fid_styles']} spread {row['fid_spread']}"
        if "fid_ci95" in row:
            extra += f"  ci95 {row['fid_ci95']}"
        print(f"iter {it:>8}: FID {fid:.3f}  target-domain rate {rate:.4f}"
              f"{extra}", flush=True)

    best = min(rows, key=lambda r: r["fid"])
    write_out(complete=True)
    hdr = f"| iteration | FID (n={args.n}) | target-domain rate |"
    sep = "|---|---|---|"
    if len(styles) > 1:
        hdr += " style spread |"
        sep += "---|"
    if args.bootstrap:
        hdr += " 95% CI |"
        sep += "---|"
    print("\n" + hdr + "\n" + sep)
    for r in rows:
        sel = " **<- selected**" if r is best else ""
        line = (f"| {r['iteration']} | {r['fid']}{sel} "
                f"| {r['target_domain_rate']} |")
        if len(styles) > 1:
            line += f" {r.get('fid_spread', '')} |"
        if args.bootstrap:
            ci = r.get("fid_ci95")
            line += f" [{ci[0]}, {ci[1]}] |" if ci else " |"
        print(line)
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
