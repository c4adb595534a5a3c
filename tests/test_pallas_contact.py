"""Pallas contact kernel vs XLA reference, bit-level agreement (interpret
mode on CPU; the same kernel compiles with Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mqe_tpu.ops.pallas_contact import sphere_boxes_pallas
from mqe_tpu.physics import contact as C


def xla_reference(pos, vel, radius, boxes, mu_scale, params):
    bc = boxes[:, None, :, 0:3]
    bh = boxes[:, None, :, 3:6]
    valid = boxes[:, None, :, 6]
    f = C.sphere_box(
        pos[:, :, None, :], vel[:, :, None, :], radius[None, :, None],
        bc, bh, params, mu_scale[:, None, None],
    )
    return (f * valid[..., None]).sum(axis=2)


def test_pallas_matches_xla():
    rng = np.random.RandomState(0)
    E, S, B = 4, 37, 5
    pos = jnp.asarray(rng.uniform(-2, 2, (E, S, 3)).astype(np.float32))
    vel = jnp.asarray(rng.uniform(-1, 1, (E, S, 3)).astype(np.float32))
    radius = jnp.asarray(rng.uniform(0.02, 0.3, (S,)).astype(np.float32))
    boxes = np.zeros((E, B, 7), dtype=np.float32)
    boxes[:, :, 0:3] = rng.uniform(-2, 2, (E, B, 3))
    boxes[:, :, 3:6] = rng.uniform(0.1, 1.0, (E, B, 3))
    boxes[:, :, 6] = (rng.uniform(0, 1, (E, B)) > 0.3).astype(np.float32)
    boxes = jnp.asarray(boxes)
    mu_scale = jnp.asarray(rng.uniform(0.5, 2.0, (E,)).astype(np.float32))
    params = C.ContactParams()

    ref = xla_reference(pos, vel, radius, boxes, mu_scale, params)
    out = sphere_boxes_pallas(pos, vel, radius, boxes, mu_scale, params, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_zero_when_far():
    E, S, B = 2, 8, 3
    pos = jnp.full((E, S, 3), 100.0)
    vel = jnp.zeros((E, S, 3))
    radius = jnp.full((S,), 0.05)
    boxes = jnp.zeros((E, B, 7)).at[:, :, 3:6].set(0.5).at[:, :, 6].set(1.0)
    out = sphere_boxes_pallas(
        pos, vel, radius, boxes, jnp.ones(E), C.ContactParams(), interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
