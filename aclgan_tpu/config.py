"""Typed configuration schema + YAML loader.

Covers every key of the reference's config surface
(/root/reference/configs/male2female.yaml:1-66, loaded as a raw dict at
/root/reference/utils.py:103-105). Here the schema is typed, validated, and
extended with TPU-specific knobs (mesh shape, dtypes, pallas toggles) that the
reference — single-GPU PyTorch — has no equivalent for.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Optional, Union

import yaml


@dataclass
class GenConfig:
    """Generator architecture (reference `gen:` block, male2female.yaml:39-47)."""

    dim: int = 64            # filters in the bottommost layer
    mlp_dim: int = 256       # width of the AdaIN-parameter MLP
    style_dim: int = 8       # length of the style code
    output_dim: int = 4      # decoder output channels (3 RGB + 1 focus mask)
    activ: str = "relu"      # relu/lrelu/prelu/selu/tanh
    n_downsample: int = 2    # downsampling convs in the content encoder
    n_res: int = 4           # residual blocks in content encoder / decoder
    pad_type: str = "reflect"  # zero/reflect/replicate


@dataclass
class DisConfig:
    """Discriminator architecture (reference `dis:` block, male2female.yaml:48-55)."""

    dim: int = 64
    norm: str = "none"       # none/bn/in/ln/sn
    activ: str = "lrelu"
    n_layer: int = 4
    gan_type: str = "lsgan"  # lsgan/nsgan
    num_scales: int = 3
    pad_type: str = "reflect"


@dataclass
class DataConfig:
    """Data pipeline options (male2female.yaml:57-65 + utils.py:43-100)."""

    input_dim_a: int = 3
    input_dim_b: int = 6     # channels seen by the consistency discriminator (pairs)
    num_workers: int = 8
    new_size: Optional[int] = 256     # resize shortest side
    new_size_a: Optional[int] = None  # per-domain override (utils.py:46-50)
    new_size_b: Optional[int] = None
    crop_image_height: int = 256
    crop_image_width: int = 256
    data_root: Optional[str] = None   # folder mode: trainA/trainB/testA/testB
    data_kind: str = ""
    # list mode (utils.py:64-72)
    data_folder_train_a: Optional[str] = None
    data_list_train_a: Optional[str] = None
    data_folder_test_a: Optional[str] = None
    data_list_test_a: Optional[str] = None
    data_folder_train_b: Optional[str] = None
    data_list_train_b: Optional[str] = None
    data_folder_test_b: Optional[str] = None
    data_list_test_b: Optional[str] = None
    synthetic: bool = False  # built-in synthetic dataset (no reference analog; for smoke tests)

    def resolved_sizes(self) -> tuple[Optional[int], Optional[int]]:
        if self.new_size is not None:
            return self.new_size, self.new_size
        return self.new_size_a, self.new_size_b


@dataclass
class TpuConfig:
    """TPU-native knobs — no reference equivalent (single GPU, train.py:42)."""

    compute_dtype: str = "bfloat16"   # dtype of conv/matmul compute; params stay f32
    # Accepted-but-inert compatibility knob: the fused Pallas IN/AdaIN
    # kernel measured SLOWER than XLA's own fusion pipeline at every model
    # shape (45.4 vs 48.9 img/s train; the r3 inference trace bounds any
    # rewrite at ~+4%) and is no longer wired into the model — see
    # docs/adr-pallas-instance-norm.md. The kernel + parity tests survive in
    # ops/pallas/instance_norm.py as a documented negative result.
    use_pallas: bool = False
    # exact collapsed-tap upsample+5x5 conv in the decoder (ops/upsample_conv.py)
    fast_upsample: bool = True
    mesh_data: int = -1               # data-parallel mesh size; -1 = all devices
    mesh_spatial: int = 1             # spatial (H) sharding axis size
    prefetch: int = 2                 # device prefetch depth for the input pipeline
    # Donate train-state buffers into the jitted step (halves the transient
    # params+moments footprint). Measured neutral in the train CLI (298 vs
    # 307 ms/iter donated/not, within day variance). NOTE: donating the
    # *chained image inputs* of a wrapper jit is NOT neutral — a probe that
    # donated (state, x_a, x_b) ran 510.9 vs 242.3 ms/iter; donation of
    # buffers that feed the next launch blocks pipelining on this backend.
    donate_state: bool = True
    check_nans: bool = False          # jax.debug NaN checking toggle (SURVEY §5.2)
    snapshot_keep: int = 0            # keep newest N snapshots; 0 = keep all (reference behavior)
    distributed: bool = False         # jax.distributed.initialize() for multi-host (DCN) runs
    # rematerialization of generator subnets during backward (batch 16 fits
    # v5e HBM without it; batch 32 needs it). False/"" = off; True/"all" =
    # every subnet; "decode" / "encode" remat only that family — "decode" is
    # the measured sweet spot for batch 32 (the 5·B decoder invocations hold
    # most of the activation memory; see BENCH_NOTES.md).
    remat: Union[bool, str] = False
    # Adam first-moment dtype; "bfloat16" halves mu HBM (optax mu_dtype).
    moment_dtype: str = "float32"
    # Gradient accumulation: split each train batch into N sequential
    # micro-batches (lax.scan) and apply the AVERAGED gradients in one
    # optimizer update. Peak activation memory drops to one micro-batch's,
    # enabling effective batches past the single-chip envelope (512^2
    # trains at batch 8 un-remat'ed, BENCH_NOTES "resolution envelope";
    # accum lifts the effective batch without more HBM). Semantics: the
    # mean of N independent micro-step gradients — identical to a single
    # big-batch step for every shipped loss EXCEPT focus_size_loss, whose
    # whole-batch-sum slack (trainer.py:149-157) is nonlinear in the batch;
    # tests pin exact equivalence on non-focus configs. batch_size must be
    # divisible by this. Composes with a data-sharded mesh (mesh_data > 1):
    # the micro split is STRIDED (sample index % accum), which is a local
    # reshape on every device — no cross-device relayout; each micro-step is
    # a (batch/accum)/mesh_data-per-device DP step. Equivalence + a
    # no-all-to-all HLO assertion live in tests/test_grad_accum.py.
    # (batch_size/accum must additionally be divisible by the mesh size.)
    grad_accum: int = 1
    # Exponential moving average of the GENERATOR weights (0 = off, the
    # reference behavior; typical GAN practice: 0.999). Updated in-graph
    # after each gen step; snapshots add an `ema_%08d.msgpack` holding the
    # same {'AB','BA'} tree as gen files, so the EMA weights serve anywhere
    # a gen checkpoint does (cli.test/test_batch, Translator, cli.export).
    # Training losses always use the live weights — EMA is an eval/serving
    # quality lever, not a change to the optimization.
    ema_decay: float = 0.0
    # Ship train batches to the device as uint8 and normalize in-graph
    # (bitwise-identical math to the host normalize). 4x less host->device
    # traffic; on the axon tunnel the f32 transfer dependency stalls the hot
    # loop ~135 ms/iter vs ~12 ms for uint8 (BENCH_NOTES "H2D").
    uint8_transfer: bool = True


@dataclass
class Config:
    # logger options (male2female.yaml:4-9)
    image_save_iter: int = 10000
    image_display_iter: int = 1000
    display_size: int = 16
    snapshot_save_iter: int = 10000
    log_iter: int = 1

    # optimization options (male2female.yaml:11-36)
    max_iter: int = 350000
    batch_size: int = 3
    weight_decay: float = 0.0001
    beta1: float = 0.5
    beta2: float = 0.999
    init: str = "kaiming"            # gaussian/kaiming/xavier/orthogonal/default
    lr: float = 0.0001
    lr_policy: str = "step"          # constant/step
    step_size: int = 100000
    gamma: float = 0.5
    gan_w: float = 1.0
    gan_cw: float = 0.2              # consistency ("council") loss weight
    focus_loss: float = 0.025        # focus-mask loss weight (0 disables masks)
    focus_delta: float = 0.001
    focus_upper: float = 0.5
    focus_lower: float = 0.3
    focus_epsilon: float = 0.01
    recon_x_w: float = 1.0
    recon_s_w: float = 1.0           # parsed-but-unused by the reference trainer too
    recon_c_w: float = 1.0
    recon_x_cyc_w: float = 1.0
    vgg_w: float = 0.0
    alpha: float = 1.0               # z_2 scale on the A→A path (trainer.py:109)
    G_update: int = 2                # G stepped every G_update iters (train.py:73-74)
    D_update: int = 1

    gen: GenConfig = field(default_factory=GenConfig)
    dis: DisConfig = field(default_factory=DisConfig)
    data: DataConfig = field(default_factory=DataConfig)
    tpu: TpuConfig = field(default_factory=TpuConfig)

    vgg_model_path: Optional[str] = None
    seed: int = 0

    # ------------------------------------------------------------------
    @property
    def style_dim(self) -> int:
        return self.gen.style_dim

    @property
    def use_focus(self) -> bool:
        return self.focus_loss > 0

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)


_NESTED = {"gen": GenConfig, "dis": DisConfig, "data": DataConfig, "tpu": TpuConfig}

# top-level YAML keys that belong to the DataConfig block in our schema but sit
# at the top level of reference configs (male2female.yaml:57-65)
_DATA_KEYS = {f.name for f in dataclasses.fields(DataConfig)}


def from_dict(raw: dict[str, Any]) -> Config:
    """Build a Config from a (reference-compatible, flat) YAML dict.

    Unknown keys raise — the schema is the contract (SURVEY §2.10).
    """
    raw = dict(raw)
    kwargs: dict[str, Any] = {}
    data_kwargs: dict[str, Any] = {}
    cfg_fields = {f.name for f in dataclasses.fields(Config)}
    for key, value in raw.items():
        if key in _NESTED:
            # an empty YAML section ("tpu:" with every knob commented out)
            # parses as None — treat it as defaults; a scalar is a user error
            # that must fail HERE, not as an AttributeError later
            if value is None:
                value = {}
            if not isinstance(value, dict):
                raise ValueError(
                    f"config section {key!r} must be a mapping, got "
                    f"{type(value).__name__}: {value!r}")
            cls = _NESTED[key]
            valid = {f.name for f in dataclasses.fields(cls)}
            unknown = set(value) - valid
            if unknown:
                raise ValueError(f"Unknown {key} config keys: {sorted(unknown)}")
            kwargs[key] = cls(**value)
        elif key in _DATA_KEYS:
            data_kwargs[key] = value
        elif key in cfg_fields:
            kwargs[key] = value
        else:
            raise ValueError(f"Unknown config key: {key!r}")
    if data_kwargs:
        base = kwargs.get("data", DataConfig())
        kwargs["data"] = dataclasses.replace(base, **data_kwargs)
    return Config(**kwargs)


def load_config(path: str | os.PathLike) -> Config:
    """Load a YAML config file (reference: utils.py:103-105, with safe_load)."""
    with open(path, "r") as stream:
        raw = yaml.safe_load(stream)
    return from_dict(raw or {})


def save_config(cfg: Config, path: str | os.PathLike) -> None:
    """Snapshot the config next to outputs (reference: train.py:61 copies the file)."""
    with open(path, "w") as stream:
        yaml.safe_dump(cfg.to_dict(), stream, sort_keys=False)
