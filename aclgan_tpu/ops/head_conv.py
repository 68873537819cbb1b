"""Polyphase (space-to-depth) formulations for the channel-starved head convs.

The two first-layer convs of the model consume Cin=3 images (networks.py:235
ContentEncoder / networks.py:217 StyleEncoder: 7x7 s1 p3 3->dim;
networks.py:40 MsImageDis: 4x4 s2 p1 3->dim), so their natural GEMMs use a
reduction depth of k*k*3 with Cin padded 3->8 by XLA — measured 24.5 TF/s on
the 7x7 head and the transposed conv in its backward is worse (Cout'=3 MXU
lanes). Factor-2 space-to-depth repacks 2x2 pixels into channels (Cin 3->12):

- 7x7 s1 head  -> 4x4 s1 conv with a (4,4,4*Cin,4*Cout) packed kernel whose
  4 output-channel blocks are the 4 output phases (1.31x the MACs at 4x the
  reduction depth), output restored by depth-to-space.
- 4x4 s2 head  -> 2x2 s1 conv with a (2,2,4*Cin,Cout) packed kernel — a PURE
  kernel reshuffle (zero MAC overhead); the output is already at H/2.

Measured on the chip (tools/probe_headconv.py + full-step bench arbitration,
BENCH_NOTES "Round 3: polyphase heads"): standalone, the 7x7 polyphase
forward LOSES at the bulk batch (output depth-to-space writes 2x the bytes)
while its backward wins, and the 4x4 s2 forward wins 1.4-1.9x — but NONE of
it transfers into the full fused train step (paired p50s within noise for
the mixed 7x7; a 2.6 ms/iter regression for the dis head). This module
therefore ships as a documented NEGATIVE RESULT: every formulation is
exact, tested, and opt-in via ACLGAN_HEAD7=mixed|poly /
ACLGAN_DIS_HEAD=poly, with the natural convs as the defaults.

Kernel parameters keep the reference shapes ((7,7,Cin,Cout) / (4,4,Cin,Cout))
— packing happens in-graph (tiny, folded by XLA) — so checkpoints and torch
imports are unaffected.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from aclgan_tpu.ops.pad import pad2d

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, w, strides=(1, 1), padding="VALID"):
    return lax.conv_general_dilated(x, w.astype(x.dtype), strides, padding,
                                    dimension_numbers=_DN)


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel index = (a*2+b)*C + c for
    pixel phase (a, b)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(y: jnp.ndarray, cout: int) -> jnp.ndarray:
    """Inverse of space_to_depth2 (same phase-major channel convention)."""
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, cout)


def pack_head7_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(7,7,Cin,Cout) -> (4,4,4*Cin,4*Cout) polyphase kernel.

    W2[t, s, (a*2+b)*Cin+ci, (p*2+q)*Cout+c] = w[2t+a-p, 2s+b-q, ci, c]
    where (a,b) indexes input phases, (p,q) output phases, and taps outside
    0 <= 2t+a-p < 7 are zero. Exact: conv(s2d(xp), W2) followed by
    depth_to_space2 equals the 7x7 VALID conv on xp (even H, W).
    """
    cin, cout = w.shape[2], w.shape[3]
    w2 = jnp.zeros((4, 4, 4 * cin, 4 * cout), w.dtype)
    for p in range(2):
        for q in range(2):
            for a in range(2):
                for b in range(2):
                    for t in range(4):
                        dy = 2 * t + a - p
                        if not 0 <= dy < 7:
                            continue
                        for s in range(4):
                            dx = 2 * s + b - q
                            if not 0 <= dx < 7:
                                continue
                            w2 = w2.at[
                                t, s,
                                (a * 2 + b) * cin:(a * 2 + b + 1) * cin,
                                (p * 2 + q) * cout:(p * 2 + q + 1) * cout,
                            ].set(w[dy, dx])
    return w2


def pack_dis4_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(4,4,Cin,Cout) -> (2,2,4*Cin,Cout): the stride-2 4x4 conv as a
    stride-1 2x2 conv over the space-to-depth input — a pure reshuffle,
    conv(s2d(xp), W2) equals the 4x4 stride-2 VALID conv on xp directly
    (even-sized xp; output rows are already the strided grid)."""
    cin, cout = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for a in range(2):
        for b in range(2):
            for t in range(2):
                for s in range(2):
                    w2 = w2.at[
                        t, s, (a * 2 + b) * cin:(a * 2 + b + 1) * cin, :
                    ].set(w[2 * t + a, 2 * s + b])
    return w2


def _head7_poly_on_padded(xp: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    cout = w.shape[3]
    y = _conv(space_to_depth2(xp), pack_head7_kernel(w))
    return depth_to_space2(y, cout)


def head7_polyphase(x: jnp.ndarray, w: jnp.ndarray, pad_type: str) -> jnp.ndarray:
    """Fully polyphase 7x7 head (fwd AND bwd via autodiff). Kept for
    measurement; the shipped default is the mixed gen_head_conv7 below."""
    return _head7_poly_on_padded(pad2d(x, 3, pad_type), w)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gen_head_conv7(x: jnp.ndarray, w: jnp.ndarray, pad_type: str) -> jnp.ndarray:
    """pad(3) -> 7x7 s1 conv, Cin small: natural forward, polyphase backward
    ("mixed"; opt-in, see use_poly_head7).

    Forward: the natural conv (the polyphase forward's output depth-to-space
    writes 2x the activation bytes). Backward d(x): the natural transposed
    conv has Cout'=Cin=3 MXU lanes; instead pull the cotangent through the
    polyphase graph: s2d(g) -> transposed conv of the packed kernel (12
    lanes, 256-deep reduction) -> d2s -> pad transpose. Backward d(w): the
    standard batch-contraction weight-grad (already MXU-shaped; reduction
    over B*H*W). Exact up to fp reassociation.
    """
    return _conv(pad2d(x, 3, pad_type), w)


def _gen_head7_fwd(x, w, pad_type):
    return gen_head_conv7(x, w, pad_type), (x, w)


def _gen_head7_bwd(pad_type, res, g):
    x, w = res
    cin, cout = w.shape[2], w.shape[3]
    xp, pad_vjp = jax.vjp(lambda t: pad2d(t, 3, pad_type), x)
    # d(xp) via the polyphase graph transpose: d2s^T = s2d (same phase-major
    # convention), then the packed conv's input-transpose (full-pad conv with
    # the spatially-flipped, io-swapped packed kernel), then s2d^T = d2s.
    w2 = pack_head7_kernel(w)                       # (4,4,4cin,4cout)
    w2_flip = w2[::-1, ::-1].swapaxes(2, 3)         # (4,4,4cout,4cin)
    g2 = space_to_depth2(g)                         # (B,H/2,W/2,4cout)
    dxs = lax.conv_general_dilated(
        g2, w2_flip.astype(g2.dtype), (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=_DN)                      # (B,Hp/2,Wp/2,4cin)
    dxp = depth_to_space2(dxs, cin)                 # (B,Hp,Wp,cin)
    dx, = pad_vjp(dxp.astype(xp.dtype))
    # d(w): batch-contraction conv — lhs (Cin,Hp,Wp,B), rhs (H,W,B,Cout)
    # -> (Cin,7,7,Cout); f32 accumulation like final_conv's weight grad.
    dw = lax.conv_general_dilated(
        xp.transpose(3, 1, 2, 0).astype(g.dtype),
        g.transpose(1, 2, 0, 3),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    ).transpose(1, 2, 0, 3)                         # (7,7,cin,cout)
    return dx.astype(x.dtype), dw.astype(w.dtype)


gen_head_conv7.defvjp(_gen_head7_fwd, _gen_head7_bwd)


def dis_head_conv4s2(x: jnp.ndarray, w: jnp.ndarray, pad_type: str) -> jnp.ndarray:
    """pad(1) -> 4x4 s2 conv as a polyphase 2x2 s1 conv (pure kernel
    reshuffle, zero MAC overhead, output already at H/2). Autodiff'd in both
    directions — the packed backward keeps 12-lane/Cout-deep GEMMs."""
    xp = pad2d(x, 1, pad_type)
    return _conv(space_to_depth2(xp), pack_dis4_kernel(w))


def use_poly_head7(x_shape, features, norm) -> str:
    """'' (natural, the DEFAULT), 'mixed', or 'poly' for a 7x7 s1 p3 head.

    Opt-in via ACLGAN_HEAD7=mixed|poly. Default is the natural conv: the
    full-fused-step arbitration (BENCH_NOTES "polyphase heads") measured the
    mixed formulation statistically indistinguishable from natural (paired
    p50s 246.4/248.1 vs 247.4/246.3 ms/iter) — the standalone backward win
    does not transfer into the step, where XLA already overlaps the
    channel-starved transposed conv with neighboring work.
    """
    mode = os.environ.get("ACLGAN_HEAD7", "direct")
    if mode not in ("mixed", "poly") or norm == "sn":
        return ""
    # polyphase needs even padded dims: H+6 even <=> H even
    if x_shape[-1] > 6 or features < 16 or x_shape[1] % 2 or x_shape[2] % 2:
        return ""
    return mode


def use_poly_dis4(x_shape, features, norm) -> bool:
    """Polyphase gate for a 4x4 s2 p1 head — opt-in via ACLGAN_DIS_HEAD=poly:
    despite the 1.9x standalone forward win it measured a 2.6 ms/iter LOSS
    in the fused step (BENCH_NOTES "polyphase heads"). Cin==3 only (Cin=6 —
    the padded-to-8 natural GEMM is already 2/3 dense there while packing
    still quadruples the input bytes' channel dim — loses even standalone)."""
    if os.environ.get("ACLGAN_DIS_HEAD") != "poly" or norm == "sn":
        return False
    return (x_shape[-1] == 3 and features >= 16
            and x_shape[1] % 2 == 0 and x_shape[2] % 2 == 0)
