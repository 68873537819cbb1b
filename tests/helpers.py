"""Shared tiny-config helpers for tests."""

from aclgan_tpu.config import Config, DataConfig, DisConfig, GenConfig, TpuConfig


def tiny_config(**overrides) -> Config:
    """A miniature male2female-shaped config: same topology, tiny dims,
    f32 compute, no pallas (CPU tests)."""
    cfg = Config(
        display_size=2,
        max_iter=100,
        batch_size=2,
        weight_decay=0.0001,
        beta1=0.5,
        beta2=0.999,
        init="kaiming",
        lr=1e-4,
        lr_policy="step",
        step_size=100000,
        gamma=0.5,
        gan_w=1.0,
        gan_cw=0.2,
        focus_loss=0.025,
        focus_delta=0.001,
        focus_upper=0.5,
        focus_lower=0.3,
        focus_epsilon=0.01,
        recon_x_w=1.0,
        alpha=1.0,
        G_update=2,
        D_update=1,
        gen=GenConfig(dim=8, mlp_dim=16, style_dim=8, output_dim=4,
                      n_downsample=2, n_res=2, pad_type="reflect"),
        dis=DisConfig(dim=8, norm="none", activ="lrelu", n_layer=2,
                      gan_type="lsgan", num_scales=2, pad_type="reflect"),
        data=DataConfig(input_dim_a=3, input_dim_b=6, num_workers=0,
                        new_size=16, crop_image_height=16, crop_image_width=16,
                        synthetic=True),
        tpu=TpuConfig(compute_dtype="float32", use_pallas=False, donate_state=False),
    )
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg
