"""Checkpoint save / discovery / resume.

Keeps the reference's logical tree and filename contract
(trainer.py:324-331): `gen_%08d.msgpack` holding {'AB','BA'},
`dis_%08d.msgpack` holding {'A','B','2'}, and a single rewritten
`optimizer.msgpack` holding {'gen','dis', 'step'}. Discovery is
lexicographic-latest on the key substring (get_model_list, utils.py:211-220);
the iteration is parsed from the filename (trainer.py:307). With
tpu.ema_decay > 0 each snapshot adds `ema_%08d.msgpack` — the same
{'AB','BA'} tree as gen files, so it serves anywhere a gen checkpoint does.

Serialization is flax msgpack with atomic `os.replace` writes (the TPU-native
stand-in for Orbax atomicity; no partial checkpoints on preemption —
SURVEY §5.3/5.4).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import flax.serialization
import jax
import jax.numpy as jnp

from aclgan_tpu.trainer import TrainState


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_checkpoint(snapshot_dir: str, state: TrainState, iterations: int,
                    keep: int = 0, rng_key=None) -> None:
    """Write gen/dis/optimizer files for `iterations` (trainer.py:324-331:
    files are stamped iterations+1).

    keep > 0 prunes to the newest `keep` snapshots (the reference keeps every
    snapshot, trainer.py:326-330). rng_key, if given, makes resume bitwise
    deterministic — the reference loses its RNG stream on resume
    (SURVEY §5.3: weights + moments + iteration only)."""
    os.makedirs(snapshot_dir, exist_ok=True)
    state = jax.device_get(state)
    gen_name = os.path.join(snapshot_dir, "gen_%08d.msgpack" % (iterations + 1))
    dis_name = os.path.join(snapshot_dir, "dis_%08d.msgpack" % (iterations + 1))
    opt_name = os.path.join(snapshot_dir, "optimizer.msgpack")
    _atomic_write(gen_name, flax.serialization.to_bytes(state.gen_params))
    dis_tree = {"params": state.dis_params, "spectral": state.dis_spectral}
    if jax.tree_util.tree_leaves(getattr(state, "dis_stats", None) or {}):
        # bn running stats (dis.norm='bn'); key absent otherwise so non-bn
        # snapshots stay byte-compatible with pre-round-4 readers
        dis_tree["batch_stats"] = state.dis_stats
    _atomic_write(dis_name, flax.serialization.to_bytes(dis_tree))
    if getattr(state, "ema_params", None) is not None:
        # same {'AB','BA'} tree as the gen file, so EMA weights serve
        # anywhere a gen checkpoint does. Written BEFORE optimizer.msgpack:
        # the optimizer stamp stays the snapshot-set commit point, so a
        # crash here is caught by the existing stamp check.
        ema_name = os.path.join(snapshot_dir,
                                "ema_%08d.msgpack" % (iterations + 1))
        _atomic_write(ema_name, flax.serialization.to_bytes(state.ema_params))
    import numpy as _np

    opt_tree = {"gen": state.gen_opt_state, "dis": state.dis_opt_state,
                "step": state.step,
                # snapshot-set stamp: optimizer.msgpack is rewritten in place
                # while gen/dis files are per-iteration, so a crash between
                # the three writes can leave mixed generations on disk; the
                # stamp lets load_checkpoint detect the mismatch instead of
                # silently pairing them (reference contract trainer.py:324-331
                # has this hazard)
                "saved_iteration": _np.int32(iterations + 1)}
    if rng_key is not None:
        opt_tree["rng"] = _np.asarray(jax.random.key_data(rng_key))
    _atomic_write(opt_name, flax.serialization.to_bytes(opt_tree))
    if keep > 0:
        for prefix in ("gen", "dis", "ema"):
            snaps = sorted(f for f in os.listdir(snapshot_dir)
                           if f.startswith(prefix + "_") and f.endswith(".msgpack"))
            for old in snaps[:-keep]:
                os.remove(os.path.join(snapshot_dir, old))


def get_model_list(dirname: str, key: str) -> Optional[str]:
    """Lexicographic-latest checkpoint containing `key` (utils.py:211-220)."""
    if not os.path.exists(dirname):
        return None
    models = [os.path.join(dirname, f) for f in os.listdir(dirname)
              if os.path.isfile(os.path.join(dirname, f))
              and key in f and f.endswith(".msgpack") and f != "optimizer.msgpack"]
    if not models:
        return None
    models.sort()
    return models[-1]


def parse_iteration(path: str) -> int:
    """gen_%08d.msgpack -> iteration (filename slice, trainer.py:307)."""
    stem = os.path.basename(path).split(".")[0]
    return int(stem.split("_")[-1])


def load_gen_params(path: str, target_gen_params: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(target_gen_params, f.read())


def load_checkpoint(
        checkpoint_dir: str, template: TrainState
) -> Tuple[TrainState, int, Optional[Any]]:
    """Restore the full training state from the latest snapshot
    (trainer.resume, trainer.py:301-322)."""
    gen_path = get_model_list(checkpoint_dir, "gen")
    if gen_path is None:
        raise FileNotFoundError(f"No gen checkpoint in {checkpoint_dir}")
    iterations = parse_iteration(gen_path)
    gen_params = load_gen_params(gen_path, template.gen_params)

    dis_path = get_model_list(checkpoint_dir, "dis")
    if dis_path is None:
        # crash between the gen and dis writes of the very first snapshot
        raise RuntimeError(
            f"Snapshot set mismatch in {checkpoint_dir}: found "
            f"{os.path.basename(gen_path)} but no dis checkpoint at all — "
            f"likely a crash between snapshot writes; delete the orphaned "
            f"gen file (or the whole directory) to start fresh")
    if parse_iteration(dis_path) != iterations:
        raise RuntimeError(
            f"Snapshot set mismatch in {checkpoint_dir}: newest gen is "
            f"iteration {iterations} ({os.path.basename(gen_path)}) but newest "
            f"dis is iteration {parse_iteration(dis_path)} "
            f"({os.path.basename(dis_path)}) — likely a crash between snapshot "
            f"writes; delete the orphaned newer file to resume from the last "
            f"complete set")
    with open(dis_path, "rb") as f:
        raw_dis = f.read()
    import msgpack

    dis_keys = msgpack.unpackb(raw_dis, raw=False, strict_map_key=False)
    dis_target = {"params": template.dis_params,
                  "spectral": template.dis_spectral}
    want_stats = bool(jax.tree_util.tree_leaves(
        getattr(template, "dis_stats", None) or {}))
    has_stats = "batch_stats" in dis_keys
    if want_stats != has_stats:
        raise RuntimeError(
            f"Checkpoint/config mismatch in {checkpoint_dir}: the config "
            f"{'expects' if want_stats else 'does not expect'} bn running "
            f"stats (dis.norm='bn') but {os.path.basename(dis_path)} "
            f"{'has none' if want_stats else 'contains batch_stats'} — the "
            f"snapshot was written under a different dis.norm")
    if has_stats:
        dis_target["batch_stats"] = template.dis_stats
    dis = flax.serialization.from_bytes(dis_target, raw_dis)

    ema_params = template.ema_params
    if template.ema_params is not None:
        ema_path = get_model_list(checkpoint_dir, "ema")
        if ema_path is not None and parse_iteration(ema_path) == iterations:
            ema_params = load_gen_params(ema_path, template.ema_params)
        else:
            # EMA enabled mid-run (or its file pruned): seed from the live
            # weights. Torn writes are still caught by the optimizer stamp —
            # ema is written before optimizer.msgpack.
            print(f"No ema checkpoint for iteration {iterations} in "
                  f"{checkpoint_dir}; seeding EMA from the gen weights")
            # copy, don't alias: with tpu.donate_state an aliased tree would
            # donate the same buffer twice in train_step (InvalidArgument on
            # the TPU runtime; see trainer.init_state)
            ema_params = jax.tree_util.tree_map(
                lambda p: jnp.array(p, copy=True), gen_params)

    opt_path = os.path.join(checkpoint_dir, "optimizer.msgpack")
    has_rng = False
    if os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            raw = f.read()
        import msgpack  # detect optional entries before typed restore

        raw_keys = msgpack.unpackb(raw, raw=False, strict_map_key=False)
        has_rng = "rng" in raw_keys
        has_stamp = "saved_iteration" in raw_keys
        target = {"gen": template.gen_opt_state, "dis": template.dis_opt_state,
                  "step": template.step}
        if has_rng:
            import numpy as _np

            target["rng"] = _np.zeros((2,), _np.uint32)
        if has_stamp:
            import numpy as _np

            target["saved_iteration"] = _np.int32(0)
        opt = flax.serialization.from_bytes(target, raw)
        if has_stamp and int(opt["saved_iteration"]) != iterations:
            raise RuntimeError(
                f"Snapshot set mismatch in {checkpoint_dir}: optimizer.msgpack "
                f"was written at iteration {int(opt['saved_iteration'])} but "
                f"the newest gen/dis files are iteration {iterations} — likely "
                f"a crash between snapshot writes; delete the orphaned newer "
                f"gen/dis files (or restore a matching optimizer) to resume "
                f"from a consistent set")
    else:
        # ported reference weights (cli/convert.py) ship no optimizer file:
        # moments start fresh, the iteration comes from the filename. That is
        # only safe when the directory really is an import — convert.py marks
        # it with imported.marker. Without the marker, a missing optimizer
        # means a crash landed between the dis and optimizer writes of the
        # first snapshot, and silently resuming with fresh moments (and a
        # reset RNG stream) would quietly degrade the run.
        if not os.path.exists(os.path.join(checkpoint_dir, "imported.marker")):
            raise RuntimeError(
                f"Snapshot set mismatch in {checkpoint_dir}: gen/dis "
                f"checkpoints exist but optimizer.msgpack does not — likely "
                f"a crash between the dis and optimizer writes of the first "
                f"snapshot. If this directory holds deliberately imported "
                f"weights (fresh optimizer intended), create an empty "
                f"'imported.marker' file next to them (cli/convert.py writes "
                f"one); otherwise delete the torn snapshot files")
        print(f"No optimizer.msgpack in {checkpoint_dir}; "
              "starting with fresh optimizer moments (imported.marker)")
        opt = {"gen": template.gen_opt_state, "dis": template.dis_opt_state,
               "step": iterations}

    state = template.replace(
        step=opt["step"],
        gen_params=gen_params,
        dis_params=dis["params"],
        dis_spectral=dis["spectral"],
        dis_stats=dis.get("batch_stats", getattr(template, "dis_stats", None)),
        gen_opt_state=opt["gen"],
        dis_opt_state=opt["dis"],
        ema_params=ema_params,
    )
    rng_key = None
    if has_rng:
        rng_key = jax.random.wrap_key_data(jnp.asarray(opt["rng"]))
    return state, iterations, rng_key


def resume(checkpoint_dir: str, template: TrainState):
    state, iterations, rng_key = load_checkpoint(checkpoint_dir, template)
    print(f"Resume from iteration {iterations}")
    return state, iterations, rng_key
