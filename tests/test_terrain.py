"""BarrierTrack terrain generator tests: deterministic builds, block layout,
oracle info, spawn rooms (ref mqe/utils/terrain/barrier_track.py behaviors)."""
import numpy as np
import pytest

from mqe_tpu.terrain.barrier_track import BarrierTrackBuilder, greedy_rects, plane_terrain


def gate_cfg():
    # mirrors Go1GateCfg.terrain (ref mqe/envs/configs/go1_gate_config.py:13-51)
    return {
        "num_rows": 2,
        "num_cols": 2,
        "horizontal_scale": 0.025,
        "border_size": 1.0,
        "BarrierTrack_kwargs": {
            "options": ["init", "gate", "plane", "wall"],
            "track_width": 3.0,
            "wall_thickness": 0.04,
            "init": {
                "block_length": 2.0,
                "room_size": (1.0, 1.5),
                "border_width": 0.0,
                "offset": (0, 0),
            },
            "gate": {
                "block_length": 3.0,
                "width": 0.6,
                "depth": 0.1,
                "offset": (0, 0),
                "random": (0.5, 0.5),
            },
            "plane": {"block_length": 1.0},
            "wall": {"block_length": 0.1},
            "wall_height": 0.5,
            "add_perlin_noise": False,
        },
    }


def test_greedy_rects_roundtrip():
    rng = np.random.default_rng(0)
    mask = np.zeros((20, 30), dtype=bool)
    mask[2:5, 4:20] = True
    mask[10:18, 0:3] = True
    mask[10:12, 10:12] = True
    rects = greedy_rects(mask)
    rebuilt = np.zeros_like(mask)
    for x0, x1, y0, y1 in rects:
        assert not rebuilt[x0:x1, y0:y1].any()  # non-overlapping
        rebuilt[x0:x1, y0:y1] = True
    assert (rebuilt == mask).all()


def test_gate_track_build():
    b = BarrierTrackBuilder(gate_cfg(), num_agents=2)
    t = b.build(seed=3)
    assert t.height.shape[0] == 2 * b.track_res[0] + 2 * 40
    # track length = 2+3+1+0.1
    np.testing.assert_allclose(t.track_length, 6.1)
    # every track has boxes (side walls + gate panels + init walls)
    nvalid = (t.boxes[..., 6] > 0).sum(axis=-1)
    assert (nvalid >= 4).all()
    # gate deviation oracle exists with |dev| <= random range
    dev = t.env_info["gate_deviation"]
    assert dev.shape == (2, 2, 2)
    assert np.abs(dev).max() <= 0.5 + 0.05
    # deviations differ across tracks (per-track randomness)
    assert np.ptp(dev) > 1e-6
    # agent spawns inside the init block, two distinct rooms
    ao = t.agent_origins
    assert ao.shape == (2, 2, 2, 3)
    rel = ao[0, 0] - t.env_origins[0, 0]
    assert ((rel[:, 0] > 0) & (rel[:, 0] < 2.0)).all()  # inside init block
    assert abs(ao[0, 0, 0, 1] - ao[0, 0, 1, 1]) > 1.0  # separated rooms

    # gate opening: a box-free corridor exists through the gate block
    # (sample the wall boxes along the gate x-range at the gate center y)
    gate_x = t.env_origins[0, 0, 0] + 2.0 + 1.5  # middle of gate block
    gate_y = t.env_origins[0, 0, 1] + dev[0, 0, 1]
    boxes = t.boxes[0, 0]
    inside = (
        (np.abs(gate_x - boxes[:, 0]) < boxes[:, 3])
        & (np.abs(gate_y - boxes[:, 1]) < boxes[:, 4])
        & (boxes[:, 6] > 0)
    )
    assert not inside.any(), boxes[inside]


def test_build_deterministic():
    b = BarrierTrackBuilder(gate_cfg(), num_agents=2)
    t1 = b.build(seed=7)
    t2 = BarrierTrackBuilder(gate_cfg(), num_agents=2).build(seed=7)
    np.testing.assert_array_equal(t1.height, t2.height)
    np.testing.assert_array_equal(t1.boxes, t2.boxes)
    np.testing.assert_array_equal(
        t1.env_info["gate_deviation"], t2.env_info["gate_deviation"]
    )


def test_perlin_ground():
    cfg = gate_cfg()
    cfg["BarrierTrack_kwargs"]["add_perlin_noise"] = True
    cfg["TerrainPerlin_kwargs"] = {"zScale": 0.08, "frequency": 10}
    b = BarrierTrackBuilder(cfg, num_agents=2)
    t = b.build(seed=1)
    assert np.abs(t.height).max() > 0.005  # noise present
    assert np.abs(t.height).max() < 0.2    # bounded by zScale octaves


def test_plane_terrain():
    t = plane_terrain(num_envs=10, num_agents=2, env_spacing=3.0)
    assert t.env_origins.reshape(-1, 3).shape[0] >= 10
    assert (t.boxes[..., 6] == 0).all()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
