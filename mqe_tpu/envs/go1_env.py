"""Vectorized multi-agent Go1 environment: pure-functional TPU-native core.

Replaces the reference's mutable-buffer class stack (BaseTask -> LeggedRobot ->
LeggedRobotField -> Go1, ref mqe/envs/base/base_task.py:40-105,
legged_robot.py:81-157, go1/go1.py:35-108) with a single pure
`step(state, commands, key) -> (state, obs, done, info)` jitted over the env
axis. Resets are masked auto-resets inside step (no indexed writes), the
hierarchical command -> locomotion -> torque chain runs fully fused, and the
env axis shards across a TPU mesh via shard_map (parallel/).

Actor layout parity: agents first then NPCs; obs is a namespace of per-agent
tensors (ObsBuf) exactly like the reference's `obs_buf = copy(cfg.obs)`
pattern (go1.py:26, 153-196) but as a pytree.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mqe_tpu.control.locomotion import (
    CLOCK_TO_LEG,
    TrotController,
    step_gait_clocks,
)
from mqe_tpu.control.nets import ActuatorNet, AdaptationModule
from mqe_tpu.envs.config import class_to_dict, default_joint_array
from mqe_tpu.ops import quat as quat_ops
from mqe_tpu.physics import contact as C
from mqe_tpu.physics import scene as S
from mqe_tpu.physics.model import load_model, load_static_geoms
from mqe_tpu.terrain import BarrierTrackBuilder, plane_terrain


@struct.dataclass
class ObsBuf:
    """Namespace observation (per-component tensors, shapes (E, A, .))."""

    base_pos: jnp.ndarray          # (E, A, 3) relative to env origin
    base_quat: jnp.ndarray         # (E, A, 4)
    base_rpy: jnp.ndarray          # (E, A, 3)
    lin_vel: jnp.ndarray           # (E, A, 3) body frame, scaled
    ang_vel: jnp.ndarray           # (E, A, 3) body frame, scaled
    dof_pos: jnp.ndarray           # (E, A, 12) offset from default, scaled
    dof_vel: jnp.ndarray           # (E, A, 12) scaled
    projected_gravity: jnp.ndarray  # (E, A, 3)
    clock_inputs: jnp.ndarray      # (E, A, 4)
    last_action: jnp.ndarray       # (E, A, 12) locomotion-level
    last_last_action: jnp.ndarray  # (E, A, 12)
    env_info: dict                 # oracle terrain info, e.g. gate_deviation (E, 2)
    # onboard forward camera (ref legged_robot_field.py:23-93); None unless
    # cfg.obs.cfgs.depth_image / rgb_image are on
    depth_image: jnp.ndarray | None = None  # (E, A, H, W) meters in [0, far]
    rgb_image: jnp.ndarray | None = None    # (E, A, H, W, 3) in [0, 1]


@struct.dataclass
class EnvState:
    phys: S.PhysState              # batched (E, ...)
    episode_length: jnp.ndarray    # (E,) int32
    gait_indices: jnp.ndarray      # (E, A)
    clock_inputs: jnp.ndarray      # (E, A, 4)
    loco_obs: jnp.ndarray          # (E, A, 70)
    loco_hist: jnp.ndarray         # (E, A, H*70) or (E, A, 0) for trot backend
    last_loco_action: jnp.ndarray  # (E, A, 12)
    last2_loco_action: jnp.ndarray
    err_hist: jnp.ndarray          # (E, A, 4, 12) actuator history
    lag_buffer: jnp.ndarray        # (E, A, L+1, 12) action lag DR (L=0 -> off)
    dr: S.DomainRand               # batched (E, ...)
    commands: jnp.ndarray          # (E, A, 3) current commands (set each step)
    vel_int: jnp.ndarray           # (E, A, 3) velocity-error integrator (trot)
    push_timer: jnp.ndarray        # (E,) int32
    done: jnp.ndarray              # (E,) bool last-step termination
    terrain_levels: jnp.ndarray    # (E,) int32 curriculum row (static if off)
    collide: jnp.ndarray           # (E,) bool termination-contact flag
    r_term: jnp.ndarray            # (E,) roll termination flag
    p_term: jnp.ndarray            # (E,) pitch termination flag


class Go1Env:
    """Static env object: holds models + terrain + compiled pure functions.

    All per-task variability (agent/NPC counts, terrain layout, termination
    terms) is baked statically at construction — heterogeneity is config-keyed
    jit, never dynamic shapes (SURVEY.md §7 hard-parts #4).
    """

    def __init__(self, cfg, num_envs: int | None = None, seed: int = 0):
        self.cfg = cfg
        self.num_envs = num_envs or cfg.env.num_envs
        self.num_agents = cfg.env.num_agents
        self.num_npcs = cfg.env.num_npcs
        E, A, N = self.num_envs, self.num_agents, self.num_npcs

        self.robot = load_model(cfg.asset.model)
        self.npc = load_model(cfg.asset.npc_model, root_free=not cfg.asset.fix_npc_base_link) if cfg.asset.npc_model else None
        self.sim_dt = cfg.sim.dt
        self.subiters = cfg.sim.subiters
        self.decimation = cfg.control.decimation
        self.dt = self.sim_dt * self.decimation  # control dt (50 Hz)
        self.max_episode_length = int(np.ceil(cfg.env.episode_length_s / self.dt))

        self.default_q = np.asarray(default_joint_array(cfg), dtype=np.float32)
        # action-lag domain randomization: joint targets are delayed by
        # lag_timesteps physics substeps (ref go1.py:337-339, 363;
        # go1_config.py:232-233). Static per-compile: L=0 disables the path.
        self.lag_len = (
            int(cfg.domain_rand.lag_timesteps)
            if getattr(cfg.domain_rand, "randomize_lag_timesteps", False)
            else 0
        )
        self.torque_limits = np.asarray(cfg.control.torque_limits, dtype=np.float32)
        self.hip_scale = np.asarray(
            [cfg.control.hip_scale_reduction, 1.0, 1.0] * 4, dtype=np.float32
        )
        self.action_scale = cfg.control.action_scale

        # ---- terrain (dispatch mirrors ref _create_terrain
        # legged_robot.py:959-970 + field terrain registry) ----
        if cfg.terrain.mesh_type == "plane":
            self.build = plane_terrain(E, A, cfg.terrain.env_spacing)
        else:
            from mqe_tpu.terrain import get_terrain_builder

            tcfg = class_to_dict(cfg.terrain)
            selected = getattr(cfg.terrain, "selected", "BarrierTrack") or "Legacy"
            builder = get_terrain_builder(
                selected if selected is not True else "BarrierTrack"
            )
            self.build = builder(tcfg, A).build(seed=seed)
        R, Cc = self.build.env_origins.shape[:2]
        rng = np.random.default_rng(seed + 1)
        rows = rng.integers(0, R, size=E)
        cols = np.arange(E) % Cc
        self.env_rows, self.env_cols = rows, cols
        self.env_origins = jnp.asarray(self.build.env_origins[rows, cols])       # (E,3)
        self.agent_origins = jnp.asarray(self.build.agent_origins[rows, cols])   # (E,A,3)
        # runtime terrain curriculum (ref _update_terrain_curriculum
        # legged_robot.py:479-503): env rows become dynamic state, promoted/
        # demoted on episode outcome; off -> all origin lookups stay static
        self.curriculum = (
            bool(getattr(cfg.terrain, "curriculum", False))
            and cfg.terrain.mesh_type != "plane"
            and R > 1
        )
        env_boxes = self.build.boxes[rows, cols]                                 # (E,B,7)
        # trim the static box budget to what this task actually uses (plane
        # tasks carry zero wall boxes -> the whole box-contact stage vanishes)
        if self.curriculum:
            nbox_used = int((self.build.boxes[..., 6] > 0).any(axis=(0, 1)).sum())
            self.grid_env_origins = jnp.asarray(self.build.env_origins)
            self.grid_agent_origins = jnp.asarray(self.build.agent_origins)
            self.grid_boxes = jnp.asarray(self.build.boxes[:, :, :nbox_used])
            self.env_cols_j = jnp.asarray(cols)
            self.num_levels = R
            # promote when the farthest agent crossed half the track
            # (ref _get_terrain_curriculum_move legged_robot.py:496-503)
            self.curr_up_dist = float(self.build.track_length) / 2.0
        else:
            nbox_used = int((env_boxes[..., 6] > 0).any(axis=0).sum())
        self.env_boxes = jnp.asarray(env_boxes[:, :nbox_used])
        self.env_info_np = {
            k: v[rows, cols] for k, v in self.build.env_info.items()
        }
        self.env_info = {k: jnp.asarray(v) for k, v in self.env_info_np.items()}
        if self.curriculum:
            # full (R, C) oracle grid so env_info follows terrain_levels at
            # runtime (fixes the frozen construction-row oracle, VERDICT r2 #7)
            self.grid_env_info = {
                k: jnp.asarray(v) for k, v in self.build.env_info.items()
            }
        self.hf = jnp.asarray(self.build.height)
        self.hf_origin = jnp.asarray(self.build.origin)
        self.hf_scale = jnp.asarray(self.build.scale, dtype=jnp.float32)

        # static fixture geoms (bridge deck / wrestling ring) placed at the
        # first NPC init position of each env
        static_rows = np.zeros((0, 8), dtype=np.float32)
        if cfg.asset.static_model:
            sg = load_static_geoms(cfg.asset.static_model)
            rows_ = []
            base = np.asarray(cfg.init_state.init_states_npc[0].pos, dtype=np.float32)
            for i in range(sg.boxes_center.shape[0]):
                rows_.append([S.SG_BOX, *(sg.boxes_center[i] + base), *sg.boxes_half[i], 1.0])
            for i in range(sg.cyl_center.shape[0]):
                rows_.append(
                    [S.SG_CYL, *(sg.cyl_center[i] + base), sg.cyl_radius[i], sg.cyl_half_length[i], 0.0, 1.0]
                )
            static_rows = np.asarray(rows_, dtype=np.float32)
        self.n_static = static_rows.shape[0]
        if self.n_static:
            sgs = np.tile(static_rows[None], (E, 1, 1))
            sgs[:, :, 1:3] += np.asarray(self.build.env_origins[rows, cols][:, None, :2])
            self.static_geoms = jnp.asarray(sgs)
        else:
            self.static_geoms = jnp.zeros((E, 0, 8), dtype=jnp.float32)

        # if a static fixture replaces the articulated NPC collision (bridge,
        # wrestling field), the NPC itself is a non-colliding anchor
        self.npc_has_collision = cfg.asset.npc_collision and cfg.asset.static_model is None

        # flat-terrain fast path: all 13 predefined tasks build a constant
        # ground heightfield (obstacles are wall boxes) -> analytic plane
        # contact, skipping the bilinear terrain gather entirely
        hmin, hmax = float(self.build.height.min()), float(self.build.height.max())
        flat_height = hmin if hmin == hmax else None

        self.scene = S.SceneModel(
            robot=self.robot,
            num_agents=A,
            npc=self.npc if self.npc_has_collision else None,
            num_npcs=N if self.npc_has_collision else 0,
            npc_root_free=not cfg.asset.fix_npc_base_link,
            contact=C.ContactParams(
                kn=cfg.physx.kn, hc_damping=cfg.physx.hc_damping,
                v_slip=cfg.physx.v_slip, f_max=cfg.physx.f_max,
            ),
            flat_height=flat_height,
        )
        # sphere masks for termination/penalty classification
        self.term_sph = self.robot.sphere_mask(cfg.asset.terminate_after_contacts_on)
        self.pen_sph = self.robot.sphere_mask(cfg.asset.penalize_contacts_on)

        # ---- control backends ----
        self.actuator = ActuatorNet()
        self.backend = cfg.control.locomotion_backend
        self.trot = TrotController(
            body_height=0.28,
            action_scale=cfg.control.action_scale,
            hip_scale_reduction=cfg.control.hip_scale_reduction,
            default_q=self.default_q,
        )
        self.adaptation = AdaptationModule() if self.backend == "policy" else None
        self.body_policy_params = None  # set via load_locomotion_policy()
        self.hist_len = 30 if self.backend == "policy" else 0
        if self.backend in ("policy", "residual"):
            # auto-load the in-framework trained body policy if present
            # (replacement for the reference's missing walk-these-ways blob)
            import os

            from mqe_tpu import ASSETS_DIR
            from mqe_tpu.control.nets import load_body_policy

            bp = os.path.join(ASSETS_DIR, "body_policy.npz")
            if os.path.exists(bp):
                self.body_policy_params = load_body_policy(bp)
                self.hist_len = 0  # obs70 policy needs no 2100-dim history

        dc = cfg.control.default_command
        gaits = cfg.command.gaits
        gait_phase = np.asarray(gaits[dc.gait], dtype=np.float32)
        self.gait_params_static = dict(
            freq=dc.gait_freq,
            phases=float(gait_phase[0]),
            offsets=float(gait_phase[1]),
            bounds=float(gait_phase[2]),
            duration=0.5,
            swing_height=max(dc.footswing_height, 0.12),
            stance_width=dc.stance_width,
            stance_length=dc.stance_length,
            body_height_delta=dc.body_height,
        )

        # init states per agent (A, 13)
        ist = cfg.init_state
        if ist.multi_init_state and ist.init_states:
            arr = np.array(
                [s.pos + s.rot + s.lin_vel + s.ang_vel for s in ist.init_states],
                dtype=np.float32,
            )
            if arr.shape[0] < A:
                arr = np.tile(arr, (int(np.ceil(A / arr.shape[0])), 1))[:A]
        else:
            arr = np.tile(
                np.asarray(ist.pos + ist.rot + ist.lin_vel + ist.ang_vel, dtype=np.float32),
                (A, 1),
            )
        self.agent_init = jnp.asarray(arr)  # (A, 13)

        if N > 0 and ist.init_states_npc:
            narr = np.array(
                [s.pos + s.rot + s.lin_vel + s.ang_vel for s in ist.init_states_npc],
                dtype=np.float32,
            )
            if narr.shape[0] < N:
                narr = np.tile(narr, (int(np.ceil(N / narr.shape[0])), 1))[:N]
            self.npc_init = jnp.asarray(narr[:N])
        elif N > 0:
            self.npc_init = jnp.zeros((N, 13), dtype=jnp.float32).at[:, 6].set(1.0)
        else:
            self.npc_init = jnp.zeros((0, 13), dtype=jnp.float32)
        if self.npc is not None:
            nq = self.npc.nq
            dnpc = np.asarray(ist.default_npc_joint_angles, dtype=np.float32)
            if dnpc.size < nq:
                dnpc = np.zeros(nq, dtype=np.float32)
            self.npc_default_q = jnp.asarray(dnpc[:nq])
        else:
            self.npc_default_q = jnp.zeros((0,), dtype=jnp.float32)

        # sheep grid init (ref go1_sheep.py:66-111) overrides init_states_npc
        self.npc_behavior = getattr(cfg.asset, "npc_behavior", "none")
        if self.npc_behavior == "sheep":
            nr, nc = cfg.asset.num_rows, cfg.asset.num_cols
            dis = cfg.asset.dis_sheep
            bt = cfg.terrain.BarrierTrack_kwargs
            ox = bt["init"]["block_length"] + bt["plane"]["block_length"] / 2 - (nr // 2) * dis[0]
            oy = -(nc // 2) * dis[1]
            pos = []
            for i in range(nr):
                for j in range(nc):
                    pos.append([ox + i * dis[0], oy + j * dis[1], 0.3])
            pos = np.asarray(pos[:N], dtype=np.float32)
            ni = np.zeros((N, 13), dtype=np.float32)
            ni[:, :3] = pos
            ni[:, 6] = 1.0
            self.npc_init = jnp.asarray(ni)

        # ---- onboard forward camera (ref legged_robot_field.py:23-93) ----
        oc = cfg.obs.cfgs
        self.cam_depth = bool(getattr(oc, "depth_image", False))
        self.cam_rgb = bool(getattr(oc, "rgb_image", False))
        if self.cam_depth or self.cam_rgb:
            from mqe_tpu.render import onboard

            fc = cfg.sensor.forward_camera
            self.cam_res = tuple(fc.resolution)
            rays = onboard.camera_rays(self.cam_res, fc.horizontal_fov)
            self._cam_rays = jnp.asarray(rays.reshape(-1, 3))     # (R, 3)
            self.cam_offset = jnp.asarray(fc.position, dtype=jnp.float32)
            # ZYX euler -> rotation matrix (camera mount in base frame,
            # ref Quat.from_euler_zyx at legged_robot_field.py:85)
            r_, p_, y_ = fc.rotation
            Rz = np.array([[np.cos(y_), -np.sin(y_), 0], [np.sin(y_), np.cos(y_), 0], [0, 0, 1]])
            Ry = np.array([[np.cos(p_), 0, np.sin(p_)], [0, 1, 0], [-np.sin(p_), 0, np.cos(p_)]])
            Rx = np.array([[1, 0, 0], [0, np.cos(r_), -np.sin(r_)], [0, np.sin(r_), np.cos(r_)]])
            self.cam_rot = jnp.asarray((Rz @ Ry @ Rx).astype(np.float32))
            self.cam_far = float(fc.far)
            # sphere-impostor radii for the other actors seen by the camera
            self.cam_agent_radius = 0.3
            if self.npc is not None and len(self.npc.sph_tags) > 0:
                self.cam_npc_radius = float(np.max(self.npc.sph_radius))
            else:
                self.cam_npc_radius = 0.25
        else:
            self._cam_rays = None

        self._step = jax.jit(self._step_impl)
        self._reset_all = jax.jit(self._reset_all_impl)

    # ------------------------------------------------------------------
    # construction of fresh (reset) states
    # ------------------------------------------------------------------
    def _fresh_env_state(self, key):
        """Sample spawn state for ONE env. Returns (agents, npcs, dr)."""
        cfg = self.cfg
        A, N = self.num_agents, self.num_npcs
        k1, k2, k3, k4, k5, k6, k7, k8 = jax.random.split(key, 8)

        base = self.agent_init  # (A, 13)
        # spawn = init-state pos + terrain agent origin (added later), matching
        # the reference's base_init_state + agent_origins (legged_robot.py:433-434)
        pos = base[:, :3]
        quat = base[:, 3:7]

        dr_cfg = cfg.domain_rand
        if dr_cfg.init_base_pos_range is not None:
            rx = dr_cfg.init_base_pos_range["x"]
            ry = dr_cfg.init_base_pos_range["y"]
            jit_x = jax.random.uniform(k1, (A,), minval=rx[0], maxval=rx[1])
            jit_y = jax.random.uniform(k2, (A,), minval=ry[0], maxval=ry[1])
            pos = pos.at[:, 0].add(jit_x).at[:, 1].add(jit_y)

        q = jnp.tile(jnp.asarray(self.default_q)[None], (A, 1))
        if dr_cfg.init_dof_pos_ratio_range is not None:
            r = dr_cfg.init_dof_pos_ratio_range
            ratio = jax.random.uniform(k3, (A, 12), minval=r[0], maxval=r[1])
            q = q * ratio
        vr = dr_cfg.init_base_vel_range
        vel6 = jax.random.uniform(k4, (A, 6), minval=vr[0], maxval=vr[1])

        agents = S.ActorState(
            pos=pos, quat=quat, lin_vel=vel6[:, :3], ang_vel=vel6[:, 3:],
            q=q, qd=jnp.zeros((A, 12)),
        )

        if N > 0:
            npos = self.npc_init[:, :3]
            nquat = self.npc_init[:, 3:7]
            if dr_cfg.init_npc_base_pos_range is not None:
                rx = dr_cfg.init_npc_base_pos_range["x"]
                ry = dr_cfg.init_npc_base_pos_range["y"]
                npos = npos.at[:, 0].add(jax.random.uniform(k5, (N,), minval=rx[0], maxval=rx[1]))
                npos = npos.at[:, 1].add(jax.random.uniform(k6, (N,), minval=ry[0], maxval=ry[1]))
            nq = jnp.tile(self.npc_default_q[None], (N, 1))
            npcs = S.ActorState(
                pos=npos, quat=nquat,
                lin_vel=self.npc_init[:, 7:10], ang_vel=self.npc_init[:, 10:13],
                q=nq, qd=jnp.zeros_like(nq),
            )
        else:
            z = lambda *s: jnp.zeros(s, dtype=jnp.float32)
            npcs = S.ActorState(z(0, 3), z(0, 4), z(0, 3), z(0, 3), z(0, 0), z(0, 0))

        # domain randomization params
        mu = jnp.asarray(1.0)
        if dr_cfg.randomize_friction:
            fr = dr_cfg.friction_range
            mu = jax.random.uniform(k7, (), minval=fr[0], maxval=fr[1])
        payload = jnp.zeros(A)
        com_shift = jnp.zeros((A, 3))
        motor = jnp.ones((A, 12))
        # independent subkeys per randomization (round 5: k8 was previously
        # both consumed for payload AND re-split, with one subkey shared by
        # com-x and motor strength — correlated draws across nominally
        # independent randomizations; VERDICT r4 weak #5)
        k_pay, k_cx, k_cy, k_cz, k_mot = jax.random.split(k8, 5)
        if dr_cfg.randomize_base_mass:
            mr = dr_cfg.added_mass_range
            payload = jax.random.uniform(k_pay, (A,), minval=mr[0], maxval=mr[1])
        if dr_cfg.randomize_com:
            cr = dr_cfg.com_range
            com_shift = jnp.stack(
                [
                    jax.random.uniform(k_cx, (A,), minval=cr["x"][0], maxval=cr["x"][1]),
                    jax.random.uniform(k_cy, (A,), minval=cr["y"][0], maxval=cr["y"][1]),
                    jax.random.uniform(k_cz, (A,), minval=cr["z"][0], maxval=cr["z"][1]),
                ],
                axis=-1,
            )
        if dr_cfg.randomize_motor:
            mr = dr_cfg.leg_motor_strength_range
            motor = jax.random.uniform(k_mot, (A, 12), minval=mr[0], maxval=mr[1])
        dr = S.DomainRand(mu_scale=mu, payload=payload, com_shift=com_shift, motor_strength=motor)
        return agents, npcs, dr

    def _origins_for(self, levels):
        """(env_origins (E,3), agent_origins (E,A,3)) — static when the
        curriculum is off, gathered by terrain level when on."""
        if self.curriculum:
            return (
                self.grid_env_origins[levels, self.env_cols_j],
                self.grid_agent_origins[levels, self.env_cols_j],
            )
        return self.env_origins, self.agent_origins

    def _offset_to_world(self, agents, npcs, ao, eo):
        """Shift spawn states by terrain origins ao (A,3) / eo (3,)."""
        agents = agents.replace(pos=agents.pos + ao.at[:, 2].set(0.0))
        if self.num_npcs > 0:
            npcs = npcs.replace(pos=npcs.pos + eo.at[2].set(0.0)[None, :])
        return agents, npcs

    def _reset_all_impl(self, key, levels=None):
        E = self.num_envs
        if levels is None:
            levels = jnp.asarray(self.env_rows, dtype=jnp.int32)
        keys = jax.random.split(key, E)
        agents, npcs, dr = jax.vmap(self._fresh_env_state)(keys)
        eo, ao = self._origins_for(levels)
        agents, npcs = jax.vmap(self._offset_to_world)(agents, npcs, ao, eo)
        A = self.num_agents
        H = self.hist_len
        return EnvState(
            phys=S.PhysState(agents=agents, npcs=npcs),
            episode_length=jnp.zeros(E, dtype=jnp.int32),
            gait_indices=jnp.zeros((E, A)),
            clock_inputs=jnp.zeros((E, A, 4)),
            loco_obs=jnp.zeros((E, A, 70)),
            loco_hist=jnp.zeros((E, A, H * 70)),
            last_loco_action=jnp.zeros((E, A, 12)),
            last2_loco_action=jnp.zeros((E, A, 12)),
            err_hist=jnp.zeros((E, A, 4, 12)),
            lag_buffer=jnp.zeros((E, A, self.lag_len + 1 if self.lag_len else 0, 12)),
            dr=dr,
            commands=jnp.zeros((E, A, 3)),
            vel_int=jnp.zeros((E, A, 3)),
            push_timer=jnp.zeros(E, dtype=jnp.int32),
            done=jnp.zeros(E, dtype=bool),
            terrain_levels=levels,
            collide=jnp.zeros(E, dtype=bool),
            r_term=jnp.zeros(E, dtype=bool),
            p_term=jnp.zeros(E, dtype=bool),
        )

    # ------------------------------------------------------------------
    # stepping
    # ------------------------------------------------------------------
    def _locomotion_action(self, state: EnvState, commands, gait_override=None):
        """commands (E, A, 3) -> locomotion action (E, A, 12) + new clocks.

        gait_override: optional dict of per-env gait params ("phases",
        "offsets", "bounds", optionally "freq") as (E,)/(E, A) arrays —
        used by multi-gait locomotion training (LocomotionEnv samples a
        library gait per episode; the WTW reference policy is gait-
        conditioned the same way, ref go1.py:240-313 clock machinery)."""
        cfg = self.cfg
        gp = self.gait_params_static
        E, A = self.num_envs, self.num_agents

        def bc(v):
            # gait params accept scalars (all tasks) or per-env (E, A)/(E, 1)
            # arrays (gait-frequency command space, gain sweeps)
            v = jnp.asarray(v, dtype=jnp.float32)
            if v.ndim == 1:  # (E,) -> (E, A)
                v = v[:, None]
            return jnp.broadcast_to(v, (E, A))

        def g(name):
            if gait_override is not None and name in gait_override:
                return bc(gait_override[name])
            return bc(gp[name])

        phases, offsets, bounds = g("phases"), g("offsets"), g("bounds")
        gait_idx, idx, clock, dbl, half = step_gait_clocks(
            state.gait_indices, self.dt,
            g("freq"), phases, offsets, bounds, bc(gp["duration"]),
        )
        idx_legs = idx[..., jnp.asarray(CLOCK_TO_LEG)]

        ag = state.phys.agents
        r, p, _ = quat_ops.get_euler_xyz_wrapped(ag.quat)
        yawq = quat_ops.yaw_quat(ag.quat)
        v_yaw = quat_ops.quat_rotate_inverse(yawq, ag.lin_vel)

        gait_arr = dict(
            freq=g("freq"),
            duration=bc(gp["duration"]),
            swing_height=bc(gp["swing_height"]),
            stance_width=bc(gp["stance_width"]),
            stance_length=bc(gp["stance_length"]),
            body_height_delta=bc(gp["body_height_delta"]),
        )
        loco_obs, loco_hist = self._fill_locomotion_obs(
            state, commands, clock,
            gait_pob=(phases, offsets, bounds) if gait_override else None,
        )
        vel_int = state.vel_int
        if self.backend in ("trot", "residual") or self.body_policy_params is None:
            # velocity-error integrator (anti-windup clamped): closes the
            # steady-state tracking deficit of the open-loop treadmill sweep
            verr = jnp.stack(
                [
                    commands[..., 0] - v_yaw[..., 0],
                    commands[..., 1] - v_yaw[..., 1],
                    commands[..., 2] - ag.ang_vel[..., 2],
                ],
                axis=-1,
            )
            cl = self.trot.INT_CLAMP
            vel_int = jnp.clip(state.vel_int + self.dt * verr, -cl, cl)
            # base height above local ground drives the anti-sag feedback;
            # all 13 predefined tasks have flat ground (flat_height fast path)
            z_meas = (
                ag.pos[..., 2] - self.scene.flat_height
                if self.scene.flat_height is not None else None
            )
            action = self.trot(
                commands, idx_legs, gait_arr, roll=r, pitch=p,
                v_meas=v_yaw[..., :2], w_meas=ag.ang_vel[..., 2],
                v_int=vel_int, z_meas=z_meas,
            )
            if self.backend == "residual" and callable(self.body_policy_params):
                # trained residual: model-based trot + learned correction
                action = action + self.body_policy_params(loco_obs)
        elif callable(self.body_policy_params):
            # in-framework trained body policy: obs70 -> action12
            action = self.body_policy_params(loco_obs)
        else:
            # original walk-these-ways stack: adaptation(hist) -> latent,
            # body(hist || latent) -> action (ref go1.py:400-407)
            from mqe_tpu.control.nets import mlp_apply

            latent = self.adaptation(loco_hist)
            action = mlp_apply(self.body_policy_params, jnp.concatenate([loco_hist, latent], -1))
        clip_a = cfg.normalization.clip_actions
        action = jnp.clip(action, -clip_a, clip_a)
        return action, gait_idx, clock, loco_obs, loco_hist, vel_int

    def _fill_locomotion_obs(self, state: EnvState, commands, clock,
                             gait_pob=None):
        """Build the 70-dim walk-these-ways obs + roll history
        (layout per ref go1.py:64-108, 411-479). gait_pob: optional
        (phases, offsets, bounds) per-env arrays overriding the static
        config gait in obs dims 8-10 (multi-gait training)."""
        cfg = self.cfg
        sc = cfg.control.obs_scales
        dc = cfg.control.default_command
        ag = state.phys.agents
        E, A = self.num_envs, self.num_agents
        g_body = quat_ops.quat_rotate_inverse(ag.quat, jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), ag.quat.shape[:-1] + (3,)))
        o = jnp.zeros((E, A, 70))
        o = o.at[..., 0:3].set(g_body)
        o = o.at[..., 3].set(commands[..., 0] * sc.lin_vel)
        o = o.at[..., 4].set(commands[..., 1] * sc.lin_vel)
        o = o.at[..., 5].set(commands[..., 2] * sc.ang_vel)
        o = o.at[..., 6].set(dc.body_height * sc.body_height)
        o = o.at[..., 7].set(dc.gait_freq * sc.gait_freq)
        if gait_pob is not None:
            ph, off, bnd = gait_pob
            o = o.at[..., 8].set(ph * sc.gait_phase)
            o = o.at[..., 9].set(off * sc.gait_phase)
            o = o.at[..., 10].set(bnd * sc.gait_phase)
        else:
            gait = cfg.command.gaits[dc.gait]
            o = o.at[..., 8].set(gait[0] * sc.gait_phase)
            o = o.at[..., 9].set(gait[1] * sc.gait_phase)
            o = o.at[..., 10].set(gait[2] * sc.gait_phase)
        o = o.at[..., 11].set(0.5 * sc.gait_phase)
        o = o.at[..., 12].set(dc.footswing_height * sc.footswing_height)
        o = o.at[..., 13].set(dc.body_pitch * sc.body_pitch)
        o = o.at[..., 14].set(dc.body_roll * sc.body_roll)
        o = o.at[..., 15].set(dc.stance_width * sc.stance_width)
        o = o.at[..., 16].set(dc.stance_length * sc.stance_length)
        o = o.at[..., 17].set(dc.aux_reward * sc.aux_reward)
        dq = (ag.q - jnp.asarray(self.default_q)) * sc.dof_pos
        o = o.at[..., 18:30].set(dq)
        o = o.at[..., 30:42].set(ag.qd * sc.dof_vel)
        o = o.at[..., 42:54].set(state.last_loco_action)
        o = o.at[..., 54:66].set(state.last2_loco_action)
        o = o.at[..., 66:70].set(clock)
        if self.hist_len > 0:
            hist = jnp.concatenate([state.loco_hist[..., 70:], o], axis=-1)
        else:
            hist = state.loco_hist
        return o, hist

    def _torques(self, state: EnvState, action):
        """Locomotion action -> joint torques via actuator net
        (ref go1.py:315-354). Returns (tau, err_hist, lag_buffer, target)."""
        scaled = action * self.action_scale * jnp.asarray(self.hip_scale)
        if self.lag_len > 0:
            # shift the lag FIFO and actuate the OLDEST entry
            # (ref go1.py:338-339: lag_buffer[1:] + [scaled]; target = lag[0])
            lag = jnp.concatenate(
                [state.lag_buffer[..., 1:, :], scaled[..., None, :]], axis=-2
            )
            target = lag[..., 0, :] + jnp.asarray(self.default_q)
        else:
            lag = state.lag_buffer
            target = scaled + jnp.asarray(self.default_q)
        ag = state.phys.agents
        err = ag.q - target
        vel = ag.qd
        h = state.err_hist  # (E, A, 4, 12): err_last, err_llast, vel_last, vel_llast
        tau = self.actuator(err, h[..., 0, :], h[..., 1, :], vel, h[..., 2, :], h[..., 3, :])
        if self.backend in ("trot", "residual") or getattr(
            self.cfg.control, "policy_pd_augment", False
        ):
            tau = tau - self.trot.TAU_KP * err - self.trot.TAU_KD * vel
        tau = tau * state.dr.motor_strength
        tl = jnp.asarray(self.torque_limits)
        tau = jnp.clip(tau, -tl, tl)
        new_hist = jnp.stack([err, h[..., 0, :], vel, h[..., 2, :]], axis=-2)
        return tau, new_hist, lag, target

    def _physics(self, state: EnvState, tau):
        """One decimation substep: subiters x scene substep over the env batch.

        Default path is scene.substep_batch (SoA dynamics: the robot batch
        rides the TPU lane axis - BENCHLOG.md round 2); use_soa=False falls
        back to vmap(scene.substep) (AoS) for A/B comparison.
        """
        npc_nq = self.npc.nq if (self.npc is not None and self.npc_has_collision) else 0
        npc_tau = jnp.zeros((self.num_envs, self.scene.num_npcs, npc_nq))
        env_boxes = (
            self.grid_boxes[state.terrain_levels, self.env_cols_j]
            if self.curriculum else self.env_boxes
        )

        if self.scene.use_soa:
            t = S.Terrain(
                height=self.hf, origin=self.hf_origin, scale=self.hf_scale,
                boxes=env_boxes, static_geoms=self.static_geoms,
            )

            def sub_b(phys, _):
                phys, contacts = S.substep_batch(
                    self.scene, t, phys, tau, npc_tau, state.dr,
                    self.sim_dt / self.subiters,
                )
                return phys, contacts

            phys, contacts_seq = jax.lax.scan(sub_b, state.phys, None, length=self.subiters)
            contacts = jax.tree.map(lambda x: x[-1], contacts_seq)
            return phys, contacts

        def one(phys, tau_e, npc_tau_e, dr_e, boxes_e, sg_e):
            t = S.Terrain(
                height=self.hf, origin=self.hf_origin, scale=self.hf_scale,
                boxes=boxes_e, static_geoms=sg_e,
            )

            def sub(phys, _):
                phys, contacts = S.substep(
                    self.scene, t, phys, tau_e, npc_tau_e, dr_e,
                    self.sim_dt / self.subiters,
                )
                return phys, contacts

            phys, contacts_seq = jax.lax.scan(sub, phys, None, length=self.subiters)
            contacts = jax.tree.map(lambda x: x[-1], contacts_seq)
            return phys, contacts

        phys, contacts = jax.vmap(one)(
            state.phys, tau, npc_tau, state.dr, env_boxes, self.static_geoms
        )
        return phys, contacts

    def _termination(self, state: EnvState, contacts):
        """Reference termination: contact on base + roll/pitch/z terms +
        timeout (ref legged_robot.py:159-169, legged_robot_field.py:121-146)."""
        cfg = self.cfg
        ag = state.phys.agents
        E, A = self.num_envs, self.num_agents

        cforce = jnp.linalg.norm(contacts.sphere_force, axis=-1)  # (E, A, ns)
        if self.term_sph.any():
            term_mask = jnp.asarray(self.term_sph)
            collide = ((cforce * term_mask[None, None, :]) > 1.0).any(axis=(-1, -2))
        else:
            collide = jnp.zeros(E, dtype=bool)
        reset = collide

        r, p, _ = quat_ops.get_euler_xyz_wrapped(ag.quat)
        z_rel = ag.pos[..., 2] - self._origins_for(state.terrain_levels)[1][..., 2]
        terms = cfg.termination.termination_terms
        r_term = jnp.zeros(E, dtype=bool)
        p_term = jnp.zeros(E, dtype=bool)
        if "roll" in terms:
            r_term = (jnp.abs(r) > cfg.termination.roll_kwargs["threshold"]).any(axis=-1)
            reset = reset | r_term
        if "pitch" in terms:
            p_term = (jnp.abs(p) > cfg.termination.pitch_kwargs["threshold"]).any(axis=-1)
            reset = reset | p_term
        if "z_low" in terms:
            reset = reset | (z_rel < cfg.termination.z_low_kwargs["threshold"]).any(axis=-1)
        if "z_high" in terms:
            reset = reset | (z_rel > cfg.termination.z_high_kwargs["threshold"]).any(axis=-1)
        timeout = state.episode_length >= self.max_episode_length
        return reset | timeout, collide, r_term, p_term, timeout

    def _observations(self, state: EnvState) -> ObsBuf:
        cfg = self.cfg
        sc = cfg.normalization.obs_scales
        ag = state.phys.agents
        origins = self._origins_for(state.terrain_levels)[0][:, None, :]  # (E,1,3)
        r, p, y = quat_ops.get_euler_xyz(ag.quat)
        g_body = quat_ops.quat_rotate_inverse(
            ag.quat, jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), ag.quat.shape[:-1] + (3,))
        )
        depth_img = rgb_img = None
        if self._cam_rays is not None:
            depth_img, rgb_img = self._render_cameras(state)
        return ObsBuf(
            base_pos=(ag.pos - origins),
            base_quat=ag.quat,
            base_rpy=jnp.stack([r, p, y], axis=-1),
            lin_vel=quat_ops.quat_rotate_inverse(ag.quat, ag.lin_vel) * sc.lin_vel,
            ang_vel=quat_ops.quat_rotate_inverse(ag.quat, ag.ang_vel) * sc.ang_vel,
            dof_pos=(ag.q - jnp.asarray(self.default_q)) * sc.dof_pos,
            dof_vel=ag.qd * sc.dof_vel,
            projected_gravity=g_body,
            clock_inputs=state.clock_inputs,
            last_action=state.last_loco_action,
            last_last_action=state.last2_loco_action,
            env_info=(
                {k: v[state.terrain_levels, self.env_cols_j]
                 for k, v in self.grid_env_info.items()}
                if self.curriculum else self.env_info
            ),
            depth_image=depth_img,
            rgb_image=rgb_img,
        )

    def _render_cameras(self, state: EnvState):
        """Batched onboard depth/RGB render (ref onboard camera sensors,
        legged_robot_field.py:23-93 / helpers.py:263-374). Other actors are
        sphere impostors at their root positions — a 16x16 RL depth sensor,
        not a visual rasterizer (PARITY.md documents the deviation)."""
        from mqe_tpu.render import onboard

        ag = state.phys.agents
        E, A = self.num_envs, self.num_agents
        N = self.num_npcs
        H, W = self.cam_res
        Rb = quat_ops.quat_to_matrix(ag.quat)                      # (E, A, 3, 3)
        cam_o = ag.pos + jnp.einsum("eaij,j->eai", Rb, self.cam_offset)
        d_world = jnp.einsum(
            "eaij,rj->eari", Rb @ self.cam_rot, self._cam_rays
        )                                                          # (E, A, R, 3)

        # sphere impostors: every agent + every NPC root; each camera masks
        # out its own body
        cent = ag.pos                                              # (E, A, 3)
        rad = jnp.full((E, A), self.cam_agent_radius)
        if N > 0:
            cent = jnp.concatenate([cent, state.phys.npcs.pos], axis=1)
            rad = jnp.concatenate([rad, jnp.full((E, N), self.cam_npc_radius)], axis=1)
        valid = jnp.ones((A, A + N)).at[:, :A].add(-jnp.eye(A))    # (A, M)
        spheres = jnp.concatenate(
            [cent, rad[..., None], jnp.ones((E, A + N, 1))], axis=-1
        )                                                          # (E, M, 5)

        boxes = (
            self.grid_boxes[state.terrain_levels, self.env_cols_j]
            if self.curriculum else self.env_boxes
        )                                                          # (E, B, 7)
        sg = self.static_geoms
        if self.n_static:
            sg_boxes = jnp.concatenate(
                [sg[:, :, 1:7], ((sg[:, :, 0] == S.SG_BOX) * sg[:, :, 7])[..., None]],
                axis=-1,
            )
            boxes = jnp.concatenate([boxes, sg_boxes], axis=1)

        flat_h = self.scene.flat_height

        def cam_one(o, d, boxes_e, sph_e, v_a):
            sph = sph_e.at[:, 4].multiply(v_a)
            return onboard.render(
                o, d, boxes_e, sph, self.cam_far, flat_height=flat_h,
                hf=self.hf, hf_origin=self.hf_origin, hf_scale=self.hf_scale,
                rgb=self.cam_rgb,
            )

        per_env = jax.vmap(cam_one, in_axes=(0, 0, None, None, 0))  # over A
        depth, rgb = jax.vmap(per_env, in_axes=(0, 0, 0, 0, None))(
            cam_o, d_world, boxes, spheres, valid
        )
        depth_img = depth.reshape(E, A, H, W) if self.cam_depth else None
        rgb_img = rgb.reshape(E, A, H, W, 3) if (self.cam_rgb and rgb is not None) else None
        return depth_img, rgb_img

    def _npc_script(self, state: EnvState, key):
        """Scripted NPC dynamics at control rate (sheep flee, ref
        go1_sheep.py:35-64). Returns updated npcs state."""
        if self.npc_behavior != "sheep" or self.num_npcs == 0:
            return state.phys.npcs
        cfg = self.cfg
        N = self.num_npcs
        nc = state.phys.npcs
        ag = state.phys.agents
        dog = ag.pos                      # (E, A, 3)
        sheep = nc.pos                    # (E, N, 3)
        avg = sheep.mean(axis=1, keepdims=True)
        rnd = cfg.asset.sheep_movement_randomness
        dv = rnd * 2.0 * jax.random.normal(key, sheep.shape)
        if N != 1:
            rel = avg - sheep
            dv = dv + rnd * rel / (jnp.linalg.norm(rel, axis=-1, keepdims=True) + 1e-9) / 1.5
        scale = cfg.asset.sheep_movement_scale
        for i in range(self.num_agents):
            rel = sheep - dog[:, i : i + 1, :]
            # ref relative_pos_to_dv: dis = |rel|^2 (norm of squared coords);
            # dv = rel / dis^1.4, zeroed beyond range (go1_sheep.py:14-18)
            dis = jnp.linalg.norm(rel**2, axis=-1)
            contrib = rel / (dis[..., None] ** 1.4 + 1e-9)
            contrib = jnp.where((dis > 9.0)[..., None], 0.0, contrib)
            dv = dv + scale * contrib
        dv = dv.at[..., 2].set(0.0)
        lin = nc.lin_vel + dv
        lin = lin.at[..., :2].set(jnp.clip(lin[..., :2], -2.0, 2.0))
        pos = nc.pos.at[..., 2].set(jnp.clip(nc.pos[..., 2], 0.0, 0.3))
        quat = nc.quat.at[..., 0].set(0.0).at[..., 1].set(0.0)
        quat = quat_ops.quat_normalize(quat)
        return nc.replace(lin_vel=lin, pos=pos, quat=quat)

    def _defender_commands(self, state: EnvState):
        """Scripted football defender command (3rd agent), ref
        go1_football_defender.py:56-80."""
        cfg = self.cfg
        ag = state.phys.agents
        dpos = ag.pos[:, 2, :]              # defender = 3rd agent
        ball = state.phys.npcs.pos[:, 0, :]
        bt = cfg.terrain.BarrierTrack_kwargs
        gate = self.env_origins + jnp.asarray(
            [bt["init"]["block_length"] + bt["plane"]["block_length"], 0.0, 0.0]
        )
        target = 0.6 * ball + 0.4 * gate
        _, _, dyaw = quat_ops.get_euler_xyz_wrapped(ag.quat[:, 2])
        to_gate = gate - dpos
        yaw_to_gate = jnp.pi + jnp.arctan(to_gate[:, 1] / (to_gate[:, 0] + 1e-9))
        yaw_cmd = jnp.clip(yaw_to_gate - dyaw, -0.3, 0.3) / 0.3
        tg_dist = jnp.linalg.norm((target - gate)[:, :2], axis=-1)
        d_dist = jnp.linalg.norm((dpos - gate)[:, :2], axis=-1)
        x_cmd = jnp.clip(tg_dist - d_dist, -0.5, 0.5)
        y_cmd = -jnp.clip(
            gate[:, 1]
            + (target[:, 1] - gate[:, 1]) * (dpos[:, 0] - gate[:, 0]) / (target[:, 0] - gate[:, 0] + 1e-9)
            - dpos[:, 1],
            -0.5, 0.5,
        )
        return jnp.stack([x_cmd, y_cmd, yaw_cmd], axis=-1)

    def _step_impl(self, state: EnvState, commands, key):
        """Pure control-rate step. commands: (E, A_cmd, 3)."""
        state, carry = self._step_pre(state, commands, key)
        return self._step_finish(state, carry)

    def _step_pre(self, state: EnvState, commands, key):
        """Physics + termination, BEFORE the masked auto-reset.

        Returns the pre-reset state (done/term flags set) plus a carry for
        `_step_finish`. Split out so task wrappers can evaluate terminal-step
        success conditions on the state that actually terminated (the
        reference reads post-reset obs — go1_wrestling_wrapper.py:55-67 —
        which can never observe success thresholds beyond the termination
        thresholds; we deviate to make success metrics meaningful)."""
        cfg = self.cfg
        E, A = self.num_envs, self.num_agents
        k_npc, k_push, k_reset, k_lv = jax.random.split(key, 4)

        if self.npc_behavior == "defender":
            dcmd = self._defender_commands(state)
            commands = jnp.concatenate([commands, dcmd[:, None, :]], axis=1)
        # action clip modes (ref legged_robot_field.py:96-115): "tanh" squashes
        # raw actions through tanh * clip_actions; "hard" (default) clips;
        # clip_actions_delta additionally rate-limits against the last command
        nrm = cfg.normalization
        method = getattr(nrm, "clip_actions_method", "hard")
        if method == "tanh":
            commands = jnp.tanh(commands) * jnp.asarray(nrm.clip_actions)
        delta = getattr(nrm, "clip_actions_delta", None)
        if delta is not None:
            d_arr = jnp.asarray(delta)
            commands = jnp.clip(
                commands, state.commands - d_arr, state.commands + d_arr
            )
        # reference clips incoming (pre-scaled) commands to [-1, 1]
        # (ref go1.py:38: torch.clip(action, -1, 1) after wrapper scaling)
        commands = jnp.clip(commands, -1.0, 1.0)

        action, gait_idx, clock, loco_obs, loco_hist, vel_int = (
            self._locomotion_action(state, commands)
        )
        state = state.replace(
            gait_indices=gait_idx, clock_inputs=clock,
            loco_obs=loco_obs, loco_hist=loco_hist,
            last2_loco_action=state.last_loco_action,
            last_loco_action=action,
            commands=commands,
            vel_int=vel_int,
        )

        # decimation loop (scanned: keeps the compiled graph 4x smaller)
        def dec_body(st, _):
            tau, err_hist, lag, _ = self._torques(st, action)
            phys, contacts = self._physics(st, tau)
            return st.replace(phys=phys, err_hist=err_hist, lag_buffer=lag), contacts

        state, contacts_seq = jax.lax.scan(dec_body, state, None, length=self.decimation)
        contacts = jax.tree.map(lambda x: x[-1], contacts_seq)

        # scripted NPCs (control rate, like reference _step_npc in post_physics)
        npcs = self._npc_script(state, k_npc)
        state = state.replace(phys=state.phys.replace(npcs=npcs))

        # push robots
        if cfg.domain_rand.push_robots:
            interval = int(np.ceil(cfg.domain_rand.push_interval_s / self.dt))
            push_now = (state.push_timer % interval) == (interval - 1)
            mv = cfg.domain_rand.max_push_vel_xy
            push_vel = jax.random.uniform(k_push, (E, A, 2), minval=-mv, maxval=mv)
            ag = state.phys.agents
            new_lv = jnp.where(
                push_now[:, None, None], ag.lin_vel.at[..., :2].set(push_vel), ag.lin_vel
            )
            state = state.replace(phys=state.phys.replace(agents=ag.replace(lin_vel=new_lv)))

        state = state.replace(
            episode_length=state.episode_length + 1,
            push_timer=state.push_timer + 1,
        )

        # termination (reset itself happens in _step_finish)
        done, collide, r_term, p_term, timeout = self._termination(state, contacts)
        state = state.replace(
            done=done, collide=collide, r_term=r_term, p_term=p_term,
        )
        return state, (done, collide, r_term, p_term, timeout, k_reset, k_lv)

    def _step_finish(self, state: EnvState, carry):
        """Curriculum + masked auto-reset + observations (post-reset half)."""
        E = self.num_envs
        done, collide, r_term, p_term, timeout, k_reset, k_lv = carry

        # terrain curriculum: promote envs whose farthest agent crossed half
        # the track, demote envs that covered less than half the commanded
        # distance (ref _update_terrain_curriculum legged_robot.py:479-503)
        levels = state.terrain_levels
        if self.curriculum:
            eo_cur = self._origins_for(levels)[0]
            dist = jnp.linalg.norm(
                state.phys.agents.pos[..., :2] - eo_cur[:, None, :2], axis=-1
            ).max(axis=-1)
            move_up = dist > self.curr_up_dist
            cmd_dist = (
                jnp.linalg.norm(state.commands[..., :2], axis=-1).mean(-1)
                * (self.max_episode_length * self.dt) * 0.5
            )
            move_down = (dist < cmd_dist) & ~move_up
            new_lv = levels + move_up.astype(jnp.int32) - move_down.astype(jnp.int32)
            # solved the last level -> random level (ref legged_robot.py:491-494)
            rand_lv = jax.random.randint(k_lv, (E,), 0, self.num_levels)
            new_lv = jnp.where(
                new_lv >= self.num_levels, rand_lv, jnp.maximum(new_lv, 0)
            )
            levels = jnp.where(done, new_lv, levels)

        fresh = self._reset_all(k_reset, levels)

        def sel(new, old):
            if new.ndim == 0:
                return old
            mask = done.reshape((E,) + (1,) * (new.ndim - 1))
            return jnp.where(mask, new, old)

        state = jax.tree.map(sel, fresh, state)
        state = state.replace(
            done=done, collide=collide, r_term=r_term, p_term=p_term,
        )

        obs = self._observations(state)
        info = {
            "time_outs": timeout,
            "reset_mask": done,
            "episode_length": state.episode_length,
        }
        return state, obs, done, info

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def reset(self, key) -> tuple[EnvState, ObsBuf]:
        state = self._reset_all(key)
        return state, self._observations(state)

    def step(self, state, commands, key):
        return self._step(state, commands, key)

    def load_locomotion_policy(self, params):
        """Install trained body-policy params (walk-these-ways stack)."""
        self.body_policy_params = params
        self._step = jax.jit(self._step_impl)
