"""Loss-head math vs hand-computed values (networks.py:60-106, trainer.py:85-88,145-161)."""

import numpy as np

import jax.numpy as jnp

from aclgan_tpu import losses


def test_lsgan_dis_loss_hand_computed():
    fake = [jnp.asarray([[2.0, 0.0]]), jnp.asarray([[1.0]])]
    real = [jnp.asarray([[1.0, 1.0]]), jnp.asarray([[0.0]])]
    # scale0: mean(fake^2)=2, mean((real-1)^2)=0 ; scale1: 1 + 1
    want = 2.0 + 0.0 + 1.0 + 1.0
    got = float(losses.dis_loss(fake, real, "lsgan"))
    assert abs(got - want) < 1e-6


def test_lsgan_gen_loss_hand_computed():
    fake = [jnp.asarray([[0.0, 2.0]])]  # mean((x-1)^2) = (1+1)/2 = 1
    assert abs(float(losses.gen_loss(fake, "lsgan")) - 1.0) < 1e-6


def test_gen_d2_mirrors_dis_loss():
    """calc_gen_d2_loss(a,b) == calc_dis_loss(fake=b, real=a) for lsgan
    (networks.py:91-106 vs 60-75)."""
    rng = np.random.RandomState(0)
    a = [jnp.asarray(rng.randn(2, 3, 3, 1).astype(np.float32))]
    b = [jnp.asarray(rng.randn(2, 3, 3, 1).astype(np.float32))]
    d2 = float(losses.gen_d2_loss(a, b, "lsgan"))
    mirror = float(losses.dis_loss(b, a, "lsgan"))
    assert abs(d2 - mirror) < 1e-5


def test_nsgan_matches_explicit_bce():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 4, 4, 1).astype(np.float32)
    got = float(losses.gen_loss([jnp.asarray(logits)], "nsgan"))
    p = 1.0 / (1.0 + np.exp(-logits))
    want = float(np.mean(-np.log(p)))
    assert abs(got - want) < 1e-5


def test_focus_translation_mask_extremes():
    """mask=+1 => pure foreground; mask=-1 => pure background (trainer.py:85-88)."""
    fg = jnp.ones((1, 2, 2, 3)) * 0.7
    bg = jnp.ones((1, 2, 2, 3)) * -0.3
    all_fg = losses.focus_translation(fg, bg, jnp.ones((1, 2, 2, 1)))
    all_bg = losses.focus_translation(fg, bg, -jnp.ones((1, 2, 2, 1)))
    np.testing.assert_allclose(np.asarray(all_fg), 0.7, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(all_bg), -0.3, rtol=1e-6)


def test_focus_translation_eval_differs_from_train():
    """The test-time blend works in [0,1] space (test.py:73-76); for mask=0
    (x_map=0.5) train gives (fg+bg)/2, eval gives the same here — they differ
    in general because eval rescales; check a case with asymmetric values."""
    fg = jnp.asarray(np.full((1, 1, 1, 3), 0.5, np.float32))
    bg = jnp.asarray(np.full((1, 1, 1, 3), -0.5, np.float32))
    mask = jnp.zeros((1, 1, 1, 1))
    train = np.asarray(losses.focus_translation(fg, bg, mask))
    ev = np.asarray(losses.focus_translation_eval(fg, bg, mask))
    # train: 0.5*0.5 + (-0.5)*0.5 = 0 ; eval: ((0.75*0.5 + 0.25*0.5)*2 - 1) = 0
    np.testing.assert_allclose(train, 0.0, atol=1e-6)
    np.testing.assert_allclose(ev, 0.0, atol=1e-6)
    # and they're affinely identical maps: eval = train (mathematically equal!)
    # ((fg+1)/2*m + (bg+1)/2*(1-m))*2-1 = fg*m + bg*(1-m) + (m + 1 - m) - 1
    rng = np.random.RandomState(2)
    fg = jnp.asarray(rng.randn(1, 3, 3, 3).astype(np.float32))
    bg = jnp.asarray(rng.randn(1, 3, 3, 3).astype(np.float32))
    mask = jnp.asarray(np.tanh(rng.randn(1, 3, 3, 1)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(losses.focus_translation(fg, bg, mask)),
        np.asarray(losses.focus_translation_eval(fg, bg, mask)),
        rtol=1e-5, atol=1e-5,
    )


def test_focus_size_loss_closed_form():
    """sum runs over all elements; relu of summed slack, squared, times delta
    (trainer.py:149-150)."""
    m = jnp.full((1, 2, 2, 1), 0.9)  # sum(m - 0.5) = 4*0.4 = 1.6
    got = float(losses.focus_size_loss(m, upper=0.5, lower=0.3, delta=0.001))
    want = (1.6 ** 2) * 0.001  # under-term: relu(4*0.3 - 3.6) = 0
    assert abs(got - want) < 1e-6

    m = jnp.full((1, 2, 2, 1), 0.1)  # lower: sum(0.3 - 0.1)*4 = 0.8 ; upper: relu(4*(0.1-0.5))=0
    got = float(losses.focus_size_loss(m, upper=0.5, lower=0.3, delta=0.001))
    want = (0.8 ** 2) * 0.001
    assert abs(got - want) < 1e-6


def test_focus_digit_loss_closed_form():
    m = jnp.full((1, 2, 2, 1), 0.5)  # |m-0.5|=0 => 1/eps each
    got = float(losses.focus_digit_loss(m, epsilon=0.01))
    assert abs(got - 4 * 100.0) < 1e-3


def test_l1_loss():
    a = jnp.asarray([[1.0, -1.0]])
    b = jnp.asarray([[0.0, 1.0]])
    assert abs(float(losses.l1_loss(a, b)) - 1.5) < 1e-6
