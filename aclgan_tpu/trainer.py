"""ACL-GAN trainer: state, optimizers, and fused jitted train steps.

TPU-native rebuild of aclgan_Trainer (trainer.py:14-331 in /root/reference).
Differences by design, not accident:

- Pure functional: a TrainState pytree (params + optimizer moments + step)
  flows through jitted `dis_step` / `gen_step` / fused `dis_gen_step`
  functions built once per config. No module mutation, no ambient RNG —
  PRNG keys are threaded explicitly (reference draws unseeded torch.randn at
  trainer.py:99-101, 254-256).
- Batched sub-network calls: the reference runs 4 encoder and 5 decoder
  forwards per gen_update (trainer.py:103-130) at batch size 3. Here calls to
  the *same* network are concatenated along batch (valid because every norm in
  the model is per-sample), turning many small convs into fewer large ones
  that tile better onto the MXU.
- `stop_gradient` on generated images in the D step replaces the reference's
  build-the-whole-graph-but-only-step-D trick (trainer.py:247-293): the D
  gradients are identical and the generator backward is never computed.
- Adam + coupled L2 (torch-style weight_decay in the gradient,
  trainer.py:39-42) via optax primitives; StepLR as a function of the *global*
  iteration (reference steps both schedulers every iteration, train.py:101).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from aclgan_tpu import losses
from aclgan_tpu.config import Config
from aclgan_tpu.models.discriminator import MsDiscriminator
from aclgan_tpu.models.generator import AdaINGenerator


def to_model_range(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 NHWC -> float32 in [-1, 1], in-graph.

    Same math as the host path (data.transforms.normalize_batch:
    `x.astype(f32) * (2/255) - 1`); shipping raw uint8 batches and
    normalizing on device moves 4x fewer bytes over the host->device link
    (tpu.uint8_transfer). Values agree with the host-normalized path to
    1 ulp of the bf16 input cast (XLA fuses the normalize into the cast;
    tested in test_train_step_uint8_inputs_match_float). Float inputs pass
    through unchanged."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x.astype(jnp.float32) * (2.0 / 255.0) - 1.0
    return x


class TrainState(flax.struct.PyTreeNode):
    """Everything that evolves during training; a single pytree so the whole
    step is one donate-able jit invocation.

    Checkpoint tree parity (trainer.py:324-331): gen_params keys {'AB','BA'},
    dis_params keys {'A','B','2'}, optimizer states keyed {'gen','dis'}.
    """

    step: jnp.ndarray            # global iteration, int32
    gen_params: Any              # {'AB': pytree, 'BA': pytree}
    dis_params: Any              # {'A': pytree, 'B': pytree, '2': pytree}
    gen_opt_state: Any
    dis_opt_state: Any
    dis_spectral: Any            # {'A': ..., 'B': ..., '2': ...} or empty dicts
    # EMA of gen_params (same {'AB','BA'} tree) when tpu.ema_decay > 0,
    # else None (None is an empty pytree: zero cost when off)
    ema_params: Any = None
    # BatchNorm running stats (flax `batch_stats` collections) when
    # dis.norm == 'bn' (networks.py:330-331), keyed like dis_params; empty
    # dicts otherwise. Mutually exclusive with a populated dis_spectral —
    # both are values of the same dis.norm menu.
    dis_stats: Any = None


class ACLGAN:
    """Owns module definitions + optimizer defs + compiled step closures.

    This object is host-side and hashable-free; all device work happens in the
    jitted functions it builds. Construct once per config.
    """

    def __init__(self, cfg: Config):
        self.cfg = cfg
        dtype = jnp.dtype(cfg.tpu.compute_dtype)
        self.dtype = dtype
        # both generators are built on input_dim_a (trainer.py:19-20)
        self.gen_def = AdaINGenerator(cfg.gen, init_type=cfg.init, dtype=dtype,
                                      fast_upsample=cfg.tpu.fast_upsample)
        self.dis_def = MsDiscriminator(cfg.dis, init_type="gaussian", dtype=dtype)
        self.style_dim = cfg.gen.style_dim
        self.use_focus = cfg.use_focus
        self.gan_type = cfg.dis.gan_type
        self._spectral = cfg.dis.norm == "sn"
        self._has_stats = cfg.dis.norm == "bn"
        self.ema_decay = float(cfg.tpu.ema_decay)

        wd = cfg.weight_decay
        # mu_dtype="bfloat16" halves first-moment HBM (TPU knob; the update
        # math still runs f32 — optax casts mu up before use)
        adam = optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=1e-8,
                                   mu_dtype=jnp.dtype(cfg.tpu.moment_dtype))
        if wd > 0:
            self.tx = optax.chain(optax.add_decayed_weights(wd), adam)
        else:
            self.tx = adam

        # VGG perceptual-loss capability (trainer.py:54-59). NOTE: like the
        # reference, this is loaded when vgg_w>0 but gen_update does NOT add
        # a vgg term — the reference's gen_update (trainer.py:90-170) never
        # calls compute_vgg_loss; it is exposed trainer API only.
        self.vgg_apply = None
        self.vgg_params = None
        if cfg.vgg_w > 0:
            from aclgan_tpu.models.vgg import load_vgg16

            weights = None
            if cfg.vgg_model_path:
                import os

                cand = os.path.join(cfg.vgg_model_path, "models", "vgg16.weight")
                weights = cand if os.path.exists(cand) else None
            self.vgg_apply, self.vgg_params = load_vgg16(weights, dtype=dtype)

        self._build_steps()

    def compute_vgg_loss(self, img, target):
        """Perceptual loss on relu5_3 features (trainer.py:172-177)."""
        if self.vgg_apply is None:
            raise RuntimeError("vgg_w == 0: VGG not loaded")
        from aclgan_tpu.models.vgg import compute_vgg_loss as _cvl

        return _cvl(self.vgg_apply, self.vgg_params, img, target)

    # ------------------------------------------------------------------
    # learning rate schedule: StepLR stepped every iteration (utils.py:263-271)
    def learning_rate(self, step: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.lr_policy == "constant":
            return jnp.asarray(cfg.lr, jnp.float32)
        if cfg.lr_policy == "step":
            exponent = (step // cfg.step_size).astype(jnp.float32)
            return cfg.lr * jnp.power(cfg.gamma, exponent)
        raise NotImplementedError(f"learning rate policy [{cfg.lr_policy}] is not implemented")

    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array, image_hw: Optional[Tuple[int, int]] = None) -> TrainState:
        cfg = self.cfg
        h = image_hw[0] if image_hw else cfg.data.crop_image_height
        w = image_hw[1] if image_hw else cfg.data.crop_image_width
        ca = cfg.data.input_dim_a
        kAB, kBA, kA, kB, k2 = jax.random.split(key, 5)
        dummy = jnp.zeros((1, h, w, ca), self.dtype)
        dummy_pair = jnp.zeros((1, h, w, cfg.data.input_dim_b), self.dtype)

        gen_params = {
            "AB": self.gen_def.init(kAB, dummy)["params"],
            "BA": self.gen_def.init(kBA, dummy)["params"],
        }
        dis_vars = {
            "A": self.dis_def.init(kA, dummy),
            "B": self.dis_def.init(kB, dummy),
            "2": self.dis_def.init(k2, dummy_pair),
        }
        dis_params = {k: v["params"] for k, v in dis_vars.items()}
        dis_spectral = {k: v.get("spectral", {}) for k, v in dis_vars.items()}
        dis_stats = {k: v.get("batch_stats", {}) for k, v in dis_vars.items()}

        return TrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            dis_params=dis_params,
            gen_opt_state=self.tx.init(gen_params),
            dis_opt_state=self.tx.init(dis_params),
            dis_spectral=dis_spectral,
            dis_stats=dis_stats,
            # EMA starts at the initial weights (standard practice). Must be
            # a COPY, not jnp.asarray (a no-op alias on jax arrays): with
            # tpu.donate_state the first train_step would then donate the
            # same PJRT buffer through two argument slots, which the TPU
            # runtime rejects with an async InvalidArgument that surfaces at
            # the next materialization (CPU ignores donation, so only chip
            # runs see it).
            ema_params=(jax.tree_util.tree_map(
                lambda p: jnp.array(p, copy=True), gen_params)
                        if self.ema_decay > 0 else None),
        )

    # ------------------------------------------------------------------
    # module apply helpers (pure). With tpu.remat these are wrapped in
    # jax.checkpoint: activations inside each subnet are recomputed during the
    # backward pass instead of stored, trading ~1 extra forward for the
    # activation memory of the 9-subnet graph (enables batch 32+ on 16GB HBM).
    # tpu.remat selects the family: True/"all" = both, "decode"/"encode" = one
    # (the 5·B decoder invocations hold most of the activation memory, so
    # "decode" frees nearly the full remat saving at a fraction of the
    # recompute — measured in BENCH_NOTES.md).
    @functools.cached_property
    def _remat_set(self):
        r = self.cfg.tpu.remat
        if r in (False, "", None, "none"):
            return frozenset()
        if r in (True, "all"):
            return frozenset({"encode", "decode"})
        if r in ("encode", "decode"):
            return frozenset({r})
        raise ValueError(f"tpu.remat must be bool|'all'|'encode'|'decode', got {r!r}")

    def _maybe_remat(self, family: str):
        return jax.checkpoint if family in self._remat_set else (lambda f: f)

    @functools.cached_property
    def _encode_fn(self):
        return self._maybe_remat("encode")(
            lambda p, x: self.gen_def.apply({"params": p}, x,
                                            method=AdaINGenerator.encode))

    @functools.cached_property
    def _encode_content_fn(self):
        return self._maybe_remat("encode")(
            lambda p, x: self.gen_def.apply({"params": p}, x,
                                            method=AdaINGenerator.encode_content))

    @functools.cached_property
    def _encode_style_fn(self):
        return self._maybe_remat("encode")(
            lambda p, x: self.gen_def.apply({"params": p}, x,
                                            method=AdaINGenerator.encode_style))

    @functools.cached_property
    def _decode_fn(self):
        return self._maybe_remat("decode")(
            lambda p, c, s: self.gen_def.apply({"params": p}, c, s,
                                               method=AdaINGenerator.decode))

    def gen_encode(self, params, x):
        return self._encode_fn(params, x)

    def gen_encode_content(self, params, x):
        return self._encode_content_fn(params, x)

    def gen_encode_style(self, params, x):
        return self._encode_style_fn(params, x)

    def gen_decode(self, params, content, style):
        return self._decode_fn(params, content, style)

    def dis_apply(self, params, spectral, x, update_spectral: bool = False,
                  stats=None, train: bool = True):
        """Run one discriminator; returns (outputs, spectral, stats).

        With dis.norm='sn' the u/v power-iteration vectors update on every
        forward when `update_spectral` (networks.py:598-600); with 'bn' the
        running mean/var update on every train-mode forward, exactly as
        torch BatchNorm2d does inside both dis_update and gen_update."""
        variables = {"params": params}
        mutable = []
        if self._spectral:
            variables["spectral"] = spectral
            if update_spectral:
                mutable.append("spectral")
        if self._has_stats:
            variables["batch_stats"] = stats
            if train:
                mutable.append("batch_stats")
        if mutable:
            outs, updated = self.dis_def.apply(variables, x, train,
                                               mutable=mutable)
            return (outs, updated.get("spectral", spectral),
                    updated.get("batch_stats", stats))
        return self.dis_def.apply(variables, x, train), spectral, stats

    # ------------------------------------------------------------------
    def _split_img_mask(self, dec_out):
        """Split decoder output into (rgb, mask) when focus masks are on
        (trainer.py:108-111 `.split(3, 1)`)."""
        if self.use_focus:
            return dec_out[..., :3], dec_out[..., 3:4]
        return dec_out, None

    def generator_forward(self, gen_params, x_a, x_b, z1, z2, z3, with_recon: bool):
        """The shared translation graph (trainer.py:98-133 / 253-280).

        Same-network calls are batched along the leading axis: gen_AB encodes
        (x_a ‖ x_b) in one pass; each decoder runs once over the concatenated
        (content, style) sets. Returns a dict of all intermediates in f32.
        """
        cfg = self.cfg
        b = x_a.shape[0]
        x_a = x_a.astype(self.dtype)
        x_b = x_b.astype(self.dtype)

        # Encode only what this step consumes. The reference always runs full
        # encoders and drops unused outputs (`c_1, _ = encode(x_a)`,
        # trainer.py:103-105,258-260); here content and style encoders are
        # invoked separately, and the D step never touches x_b at all (its
        # only use is the identity recon, a G-step-only loss).
        if with_recon:
            c_ab = self.gen_encode_content(gen_params["AB"],
                                           jnp.concatenate([x_a, x_b], 0))
            c_1, c_4 = c_ab[:b], c_ab[b:]
            s_4 = self.gen_encode_style(gen_params["AB"], x_b)
            c_2 = self.gen_encode_content(gen_params["BA"], x_a)
            s_2 = self.gen_encode_style(gen_params["BA"], x_a)
        else:
            c_1 = self.gen_encode_content(gen_params["AB"], x_a)
            c_2 = self.gen_encode_content(gen_params["BA"], x_a)

        z1 = z1.astype(self.dtype)
        z2 = (cfg.alpha * z2).astype(self.dtype)  # alpha scales z_2 only (trainer.py:109)
        z3 = z3.astype(self.dtype)

        # decode with gen_AB: translation A->B (+ B self-recon when needed)
        if with_recon:
            dec_ab = self.gen_decode(
                gen_params["AB"],
                jnp.concatenate([c_1, c_4], 0),
                jnp.concatenate([z1, s_4], 0),
            )
            dec_B, dec_B_recon = dec_ab[:b], dec_ab[b:]
        else:
            dec_B = self.gen_decode(gen_params["AB"], c_1, z1)
            dec_B_recon = None

        x_B_fake_raw, x_B_mask = self._split_img_mask(dec_B)
        if self.use_focus:
            x_B_fake = losses.focus_translation(x_B_fake_raw, x_a, x_B_mask)
        else:
            x_B_fake = x_B_fake_raw

        # second encode: gen_BA over the fake B, content only (trainer.py:125)
        c_3 = self.gen_encode_content(gen_params["BA"], x_B_fake)

        # decode with gen_BA: A-noise path, A2 back-translation (+ A self-recon)
        contents = [c_2, c_3] + ([c_2] if with_recon else [])
        styles = [z2, z3] + ([s_2] if with_recon else [])
        dec_ba = self.gen_decode(
            gen_params["BA"], jnp.concatenate(contents, 0), jnp.concatenate(styles, 0)
        )
        dec_A, dec_A2 = dec_ba[:b], dec_ba[b:2 * b]
        dec_A_recon = dec_ba[2 * b:] if with_recon else None

        x_A_fake_raw, x_A_mask = self._split_img_mask(dec_A)
        x_A2_fake_raw, x_A2_mask = self._split_img_mask(dec_A2)
        if self.use_focus:
            x_A_fake = losses.focus_translation(x_A_fake_raw, x_a, x_A_mask)
            x_A2_fake = losses.focus_translation(x_A2_fake_raw, x_B_fake, x_A2_mask)
        else:
            x_A_fake = x_A_fake_raw
            x_A2_fake = x_A2_fake_raw

        out = {
            "x_B_fake": x_B_fake,
            "x_A_fake": x_A_fake,
            "x_A2_fake": x_A2_fake,
            "x_B_mask": x_B_mask,
            "x_A_mask": x_A_mask,
            "x_A2_mask": x_A2_mask,
            # channel-concat pairs for the consistency discriminator
            # (trainer.py:132-133; NHWC -> concat on channel axis)
            "pair_A1": jnp.concatenate([x_a, x_A_fake], axis=-1),
            "pair_A2": jnp.concatenate([x_a, x_A2_fake], axis=-1),
        }
        if with_recon:
            # identity recons are the raw first 3 channels, never blended
            # (trainer.py:113-116 — the blend is commented out in the reference)
            out["x_A_recon"] = dec_A_recon[..., :3]
            out["x_B_recon"] = dec_B_recon[..., :3]
        return out

    # ------------------------------------------------------------------
    def _draw_z(self, key, batch):
        ks = jax.random.split(key, 3)
        shape = (batch, self.style_dim)
        return tuple(jax.random.normal(k, shape, jnp.float32) for k in ks)

    def _dis_loss_fn(self, dis_params, dis_spectral, dis_stats, fwd, x_a, x_b):
        """D losses (trainer.py:282-290) with batched per-discriminator forwards."""
        cfg = self.cfg
        b = x_a.shape[0]
        gt = self.gan_type
        x_a = x_a.astype(self.dtype)
        x_b = x_b.astype(self.dtype)

        # dis_A sees fake1 ‖ fake2 ‖ real in one forward
        a_in = jnp.concatenate([fwd["x_A_fake"], fwd["x_A2_fake"], x_a], 0)
        a_outs, spec_A, st_A = self.dis_apply(
            dis_params["A"], dis_spectral["A"], a_in, True, dis_stats["A"])
        fake1 = [o[:b] for o in a_outs]
        fake2 = [o[b:2 * b] for o in a_outs]
        real_a = [o[2 * b:] for o in a_outs]
        loss_dis_A = 0.5 * (losses.dis_loss(fake1, real_a, gt)
                            + losses.dis_loss(fake2, real_a, gt))

        b_in = jnp.concatenate([fwd["x_B_fake"], x_b], 0)
        b_outs, spec_B, st_B = self.dis_apply(
            dis_params["B"], dis_spectral["B"], b_in, True, dis_stats["B"])
        loss_dis_B = losses.dis_loss([o[:b] for o in b_outs], [o[b:] for o in b_outs], gt)

        # dis_2: pair2 plays "real", pair1 plays "fake" (trainer.py:286)
        p_in = jnp.concatenate([fwd["pair_A1"], fwd["pair_A2"]], 0)
        p_outs, spec_2, st_2 = self.dis_apply(
            dis_params["2"], dis_spectral["2"], p_in, True, dis_stats["2"])
        loss_dis_2 = losses.dis_loss([o[:b] for o in p_outs], [o[b:] for o in p_outs], gt)

        total = (cfg.gan_w * loss_dis_A + cfg.gan_w * loss_dis_B
                 + cfg.gan_cw * loss_dis_2)
        metrics = {
            "loss_dis_A": loss_dis_A,
            "loss_dis_B": loss_dis_B,
            "loss_dis_2": loss_dis_2,
            "loss_dis_total": total,
        }
        new_spectral = {"A": spec_A, "B": spec_B, "2": spec_2}
        new_stats = {"A": st_A, "B": st_B, "2": st_2}
        return total, (metrics, new_spectral, new_stats)

    def _gen_loss_fn(self, gen_params, dis_params, dis_spectral, dis_stats,
                     x_a, x_b, z1, z2, z3):
        """G losses (trainer.py:135-165). Spectral u/v are power-iterated here
        too — the reference updates them on EVERY D forward, including those
        inside gen_update (networks.py:598-600) — and returned via aux; bn
        running stats likewise update on these train-mode forwards."""
        cfg = self.cfg
        b = x_a.shape[0]
        gt = self.gan_type
        fwd = self.generator_forward(gen_params, x_a, x_b, z1, z2, z3, with_recon=True)

        a_in = jnp.concatenate([fwd["x_A_fake"], fwd["x_A2_fake"]], 0)
        a_outs, spec_A, st_A = self.dis_apply(
            dis_params["A"], dis_spectral["A"], a_in, True, dis_stats["A"])
        loss_adv_A = 0.5 * (losses.gen_loss([o[:b] for o in a_outs], gt)
                            + losses.gen_loss([o[b:] for o in a_outs], gt))
        b_outs, spec_B, st_B = self.dis_apply(
            dis_params["B"], dis_spectral["B"], fwd["x_B_fake"], True,
            dis_stats["B"])
        loss_adv_B = losses.gen_loss(b_outs, gt)
        p_in = jnp.concatenate([fwd["pair_A1"], fwd["pair_A2"]], 0)
        p_outs, spec_2, st_2 = self.dis_apply(
            dis_params["2"], dis_spectral["2"], p_in, True, dis_stats["2"])
        loss_adv_2 = losses.gen_d2_loss([o[:b] for o in p_outs], [o[b:] for o in p_outs], gt)
        new_spectral = {"A": spec_A, "B": spec_B, "2": spec_2}
        new_stats = {"A": st_A, "B": st_B, "2": st_2}

        total = (cfg.gan_w * loss_adv_A + cfg.gan_w * loss_adv_B
                 + cfg.gan_cw * loss_adv_2)
        metrics = {
            "loss_gen_adv_A": loss_adv_A,
            "loss_gen_adv_B": loss_adv_B,
            "loss_gen_adv_2": loss_adv_2,
        }

        if self.use_focus:
            # masks mapped to [0,1] then size+digit regularizers
            # (trainer.py:145-161), normalized by H*W*B*3
            norm = x_a.shape[1] * x_a.shape[2] * x_a.shape[0] * 3
            focus_total = 0.0
            for name, mask in (("B", fwd["x_B_mask"]), ("A", fwd["x_A_mask"]),
                               ("A2", fwd["x_A2_mask"])):
                m01 = (mask.astype(jnp.float32) + 1.0) * 0.5
                size_l = losses.focus_size_loss(m01, cfg.focus_upper,
                                                cfg.focus_lower, cfg.focus_delta)
                digit_l = losses.focus_digit_loss(m01, cfg.focus_epsilon)
                metrics[f"loss_gen_focus_{name}_size"] = size_l
                metrics[f"loss_gen_focus_{name}_digit"] = digit_l
                focus_total += size_l + digit_l
            total += cfg.focus_loss * focus_total / norm

        loss_idt_A = losses.l1_loss(fwd["x_A_recon"], x_a)
        loss_idt_B = losses.l1_loss(fwd["x_B_recon"], x_b)
        total += cfg.recon_x_w * loss_idt_A + cfg.recon_x_w * loss_idt_B
        metrics["loss_idt_A"] = loss_idt_A
        metrics["loss_idt_B"] = loss_idt_B
        metrics["loss_gen_total"] = total
        return total, (metrics, new_spectral, new_stats)

    # ------------------------------------------------------------------
    def _build_steps(self):
        tx = self.tx
        accum = max(1, int(self.cfg.tpu.grad_accum))

        def apply_updates(params, opt_state, grads, lr):
            updates, new_opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            return optax.apply_updates(params, updates), new_opt_state

        def _micro_axis(x):
            """(B, ...) -> (accum, B/accum, ...) via the STRIDED partition
            (micro-batch m takes samples with index % accum == m). Shapes are
            static, so the divisibility check runs at trace time with a clear
            message.

            The strided partition (reshape to (B/accum, accum) then swap)
            composes with a batch axis sharded over a data mesh: each row of
            the result keeps dim-1 index j on the same device that held
            sample j*accum+m, so under GSPMD the split is a LOCAL reshape +
            transpose on every device — no all-to-all, each micro-step stays
            an (B/accum)/n_data-per-device data-parallel step (asserted
            against the compiled HLO in tests/test_grad_accum.py). A
            contiguous (accum, B/accum) reshape would instead gather each
            micro-batch from a contiguous global slice spanning a subset of
            devices — a re-layout every scan iteration. Micro-batch
            COMPOSITION is the only difference, and batch order carries no
            semantics (loader order is arbitrary; the gradient is the mean
            over micro-batches either way)."""
            if x.shape[0] % accum:
                raise ValueError(
                    f"batch_size {x.shape[0]} not divisible by "
                    f"tpu.grad_accum {accum}")
            stacked = x.reshape(x.shape[0] // accum, accum, *x.shape[1:])
            return jnp.swapaxes(stacked, 0, 1)

        def _accumulate(grad_one, mut0, params_like, xs):
            """Run `grad_one(mut, micro_inputs) -> (grads, metrics, new_mut)`
            over `accum` sequential micro-batches (lax.scan: peak activation
            memory = ONE micro-batch's), summing grads and stacking metrics.
            Returns (mean grads, mean metrics, mut). `mut` is the
            (spectral, batch_stats) pair of per-forward-mutable collections.

            Gradient semantics: the mean of `accum` independent micro-step
            gradients. Exactly a big-batch step for every per-sample-mean /
            per-element-sum loss (all shipped losses but focus_size_loss,
            whose batch-sum slack is nonlinear — see config.TpuConfig).
            Spectral u/v power-iterate once per micro-forward, matching the
            reference's every-forward cadence (networks.py:598-600); bn
            running stats likewise advance once per micro-forward."""
            zeros = jax.tree_util.tree_map(jnp.zeros_like, params_like)

            def body(carry, inp):
                mut, gacc = carry
                grads, metrics, mut = grad_one(mut, inp)
                gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
                return (mut, gacc), metrics

            (mut, gsum), mstack = jax.lax.scan(
                body, (mut0, zeros), xs)
            grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
            metrics = jax.tree_util.tree_map(lambda v: jnp.mean(v, 0), mstack)
            return grads, metrics, mut

        def dis_update(state: TrainState, x_a, x_b, key):
            """One discriminator update (trainer.py:247-293). Generator outputs
            are computed fresh and stop_gradient'ed."""
            z1, z2, z3 = self._draw_z(key, x_a.shape[0])
            grad_fn = jax.value_and_grad(self._dis_loss_fn, has_aux=True)

            def grad_one(mut, inp):
                spectral, stats = mut
                xa_i, xb_i, z1_i, z2_i, z3_i = inp
                fwd = self.generator_forward(state.gen_params, xa_i, xb_i,
                                             z1_i, z2_i, z3_i, with_recon=False)
                fwd = jax.tree_util.tree_map(jax.lax.stop_gradient, fwd)
                (_, (metrics, new_spectral, new_stats)), grads = grad_fn(
                    state.dis_params, spectral, stats, fwd, xa_i, xb_i)
                return grads, metrics, (new_spectral, new_stats)

            mut0 = (state.dis_spectral, state.dis_stats)
            if accum == 1:
                grads, metrics, mut = grad_one(mut0, (x_a, x_b, z1, z2, z3))
            else:
                grads, metrics, mut = _accumulate(
                    grad_one, mut0, state.dis_params,
                    tuple(_micro_axis(v) for v in (x_a, x_b, z1, z2, z3)))
            lr = self.learning_rate(state.step)
            new_params, new_opt = apply_updates(state.dis_params,
                                                state.dis_opt_state, grads, lr)
            return state.replace(dis_params=new_params, dis_opt_state=new_opt,
                                 dis_spectral=mut[0], dis_stats=mut[1]), metrics

        def gen_update(state: TrainState, x_a, x_b, key):
            """One generator update (trainer.py:90-170); fresh z draws."""
            z1, z2, z3 = self._draw_z(key, x_a.shape[0])
            grad_fn = jax.value_and_grad(self._gen_loss_fn, has_aux=True)

            def grad_one(mut, inp):
                spectral, stats = mut
                xa_i, xb_i, z1_i, z2_i, z3_i = inp
                (_, (metrics, new_spectral, new_stats)), grads = grad_fn(
                    state.gen_params, state.dis_params, spectral, stats,
                    xa_i, xb_i, z1_i, z2_i, z3_i)
                return grads, metrics, (new_spectral, new_stats)

            mut0 = (state.dis_spectral, state.dis_stats)
            if accum == 1:
                grads, metrics, mut = grad_one(mut0, (x_a, x_b, z1, z2, z3))
            else:
                grads, metrics, mut = _accumulate(
                    grad_one, mut0, state.gen_params,
                    tuple(_micro_axis(v) for v in (x_a, x_b, z1, z2, z3)))
            lr = self.learning_rate(state.step)
            new_params, new_opt = apply_updates(state.gen_params,
                                                state.gen_opt_state, grads, lr)
            state = state.replace(gen_params=new_params, gen_opt_state=new_opt,
                                  dis_spectral=mut[0], dis_stats=mut[1])
            if self.ema_decay > 0:  # host-side guard: off => graph unchanged
                d = self.ema_decay
                state = state.replace(ema_params=jax.tree_util.tree_map(
                    lambda e, p: d * e + (1.0 - d) * p,
                    state.ema_params, new_params))
            return state, metrics

        def train_step(state: TrainState, x_a, x_b, key, do_dis: bool,
                       do_gen: bool, step_increment: int = 1):
            """Fused per-iteration step. The reference runs dis_update then
            gen_update in that order, each drawing fresh noise (train.py:71-74);
            `do_dis`/`do_gen` encode the D_update/G_update cadence and are
            static, so each cadence variant compiles once.

            `step_increment` = 1 + the number of loop iterations the cadence
            skipped entirely (neither update) since the previous call. The
            reference steps its LR scheduler every loop iteration regardless
            (train.py:101), so folding the skips in keeps state.step — and
            with it the StepLR schedule and the fold_in RNG stream — a
            function of the GLOBAL iteration for any D_update/G_update pair,
            not just the shipped gap-free cadence. Static, and its distinct
            values are bounded by the cadence cycle, so the compile count
            stays bounded too.

            `key` is a LOOP-INVARIANT base key: the per-iteration key is
            derived in-graph as fold_in(key, step). This keeps the host loop
            free of per-iteration RNG dispatches — on the axon backend any
            extra per-iteration executable (even a tiny host-side
            jax.random.split) stalls the pipeline ~540 ms/iter (BENCH_NOTES
            "measurement caveat") — and makes resume trivially deterministic:
            restoring (base key, step) reproduces the exact key stream."""
            if step_increment != 1:  # advance past the skipped iterations
                state = state.replace(step=state.step + (step_increment - 1))
            x_a = to_model_range(x_a)
            x_b = to_model_range(x_b)
            kd, kg = jax.random.split(jax.random.fold_in(key, state.step))
            metrics: Dict[str, jnp.ndarray] = {}
            if do_dis:
                state, m = dis_update(state, x_a, x_b, kd)
                metrics.update(m)
            if do_gen:
                state, m = gen_update(state, x_a, x_b, kg)
                metrics.update(m)
            state = state.replace(step=state.step + 1)
            return state, metrics

        donate = (0,) if self.cfg.tpu.donate_state else ()
        self.train_step = jax.jit(train_step, static_argnums=(4, 5, 6),
                                  donate_argnums=donate)
        self._dis_update = dis_update
        self._gen_update = gen_update

    # ------------------------------------------------------------------
    # inference / visualization
    def translate(self, gen_params, x, style, a2b: bool = True, eval_blend: bool = True):
        """Translate a batch with a given style code (test.py:96-111).

        Returns (image, mask_or_None). `eval_blend` selects the test-time
        [0,1]-space blend (test.py:73-76) vs the train-time blend.
        """
        enc_key = "AB" if a2b else "BA"
        x = to_model_range(x)
        content, _ = self.gen_encode(gen_params[enc_key], x.astype(self.dtype))
        dec = self.gen_decode(gen_params[enc_key], content, style.astype(self.dtype))
        img, mask = self._split_img_mask(dec)
        if mask is not None:
            blend = losses.focus_translation_eval if eval_blend else losses.focus_translation
            img = blend(img, x.astype(img.dtype), mask)
        return img, mask

    def sample(self, gen_params, x_a, x_b, z1, z2, z3):
        """Visualization grid rows (trainer.py:179-245), batched instead of the
        reference's per-image python loop. Uses the train-time blend as the
        reference does. Returns the focus-branch 9-tuple or non-focus 7-tuple.
        """
        x_a = to_model_range(x_a).astype(self.dtype)
        x_b = to_model_range(x_b).astype(self.dtype)
        z1 = z1.astype(self.dtype)
        z2 = z2.astype(self.dtype)
        z3 = z3.astype(self.dtype)
        gBA, gAB = gen_params["BA"], gen_params["AB"]

        c_1, s_1 = self.gen_encode(gBA, x_a)
        c_2, _ = self.gen_encode(gAB, x_a)
        if self.use_focus:
            dec = self.gen_decode(gBA, jnp.concatenate([c_1, c_1], 0),
                                  jnp.concatenate([z1, s_1], 0))
            b = x_a.shape[0]
            img, mask_A = self._split_img_mask(dec[:b])
            x_A_fake = losses.focus_translation(img, x_a, mask_A)
            x_A_recon, mask_recon = self._split_img_mask(dec[b:])

            x_b_img_raw, mask_B = self._split_img_mask(self.gen_decode(gAB, c_2, z2))
            x_B_fake = losses.focus_translation(x_b_img_raw, x_a, mask_B)

            c_3, _ = self.gen_encode(gBA, x_B_fake)
            img2, mask_A2 = self._split_img_mask(self.gen_decode(gBA, c_3, z3))
            x_A2_fake = losses.focus_translation(img2, x_B_fake, mask_A2)
            return (x_a, x_A_fake, mask_A, x_B_fake, mask_B, x_A2_fake, mask_A2,
                    x_A_recon, mask_recon)

        x_A_fake = self.gen_decode(gBA, c_1, z1)
        x_A_recon = self.gen_decode(gBA, c_1, s_1)
        x_B_fake = self.gen_decode(gAB, c_2, z2)
        c_3, _ = self.gen_encode(gBA, x_B_fake)
        x_A2_fake = self.gen_decode(gBA, c_3, z3)
        c_4, s_4 = self.gen_encode(gAB, x_b)
        x_B_recon = self.gen_decode(gAB, c_4, s_4)
        return (x_a, x_A_fake, x_B_fake, x_A2_fake, x_A_recon, x_b, x_B_recon)
