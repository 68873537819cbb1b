"""Fine-tune the flax InceptionV3 as a two-domain classifier for IS/CIS/FID.

The reference's IS/CIS protocol scores translations with an inception model
*fine-tuned on the two domains* (utils.py:239-248, test_batch.py:54-61 load
user-supplied inception_a/inception_b checkpoints). Pretrained torchvision
weights are unobtainable in a zero-egress image, so this is the in-env
realization of that protocol: train InceptionV3(num_classes=2) to separate
trainA from trainB, save flax-native msgpack weights, and pass them to
cli/test_batch.py --inception_weights. BatchNorm runs with frozen identity
statistics (the scorer evaluates the same way, so train == eval semantics).

    python tools/train_inception.py --data_root /tmp/aclgan_ds \
        --out /tmp/aclgan_run/inception_synthfaces.msgpack --steps 300
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from aclgan_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()


def load_folder(folder: str, size: int = 149) -> np.ndarray:
    """All images in a folder as (N, size, size, 3) float32 in [0, 1].

    149 (=299/2) keeps the from-scratch fine-tune cheap; the scorer's jitted
    predict resizes whatever it gets to 299 anyway, and bilinear upscale of
    these synthetic scenes loses nothing the classifier needs.
    """
    from PIL import Image

    files = sorted(os.listdir(folder))
    out = []
    for f in files:
        if not f.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        im = Image.open(os.path.join(folder, f)).convert("RGB").resize(
            (size, size), Image.BILINEAR)
        out.append(np.asarray(im, np.float32) / 255.0)
    return np.stack(out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True,
                   help="folder with trainA/ and trainB/")
    p.add_argument("--out", required=True, help="output .msgpack path")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--size", type=int, default=149)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import flax.serialization
    import optax

    from aclgan_tpu.eval.inception import InceptionV3

    xa = load_folder(os.path.join(args.data_root, "trainA"), args.size)
    xb = load_folder(os.path.join(args.data_root, "trainB"), args.size)
    x = np.concatenate([xa, xb])
    y = np.concatenate([np.zeros(len(xa), np.int32), np.ones(len(xb), np.int32)])
    print(f"train set: {len(xa)} A + {len(xb)} B images at {args.size}px")

    model = InceptionV3(num_classes=2)
    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.zeros((1, args.size, args.size, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb_, yb_):
        def loss_fn(p):
            logits = model.apply({"params": p, "batch_stats": batch_stats}, xb_)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, yb_)
            acc = jnp.mean((jnp.argmax(logits, -1) == yb_).astype(jnp.float32))
            return ce.mean(), acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    for i in range(args.steps):
        idx = rng.choice(len(x), args.batch, replace=False)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(x[idx]), jnp.asarray(y[idx]))
        if (i + 1) % 25 == 0 or i == 0:
            print(f"step {i + 1}/{args.steps}: loss={float(loss):.4f} "
                  f"acc={float(acc):.3f} ({time.time() - t0:.1f}s)")

    # holdout-ish check on the full set (the metric classifier just needs to
    # separate the domains; report what it achieves)
    logits = []
    for s in range(0, len(x), 64):
        logits.append(np.asarray(model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(x[s:s + 64]))))
    acc = float(np.mean(np.argmax(np.concatenate(logits), -1) == y))
    print(f"full-set accuracy: {acc:.4f}")

    blob = flax.serialization.msgpack_serialize(
        {"params": jax.tree_util.tree_map(np.asarray, params),
         "batch_stats": jax.tree_util.tree_map(np.asarray, batch_stats)})
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
