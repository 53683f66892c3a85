"""Checkpoint / resume for VO runs.

The reference has no in-process checkpointing (SURVEY.md §5) — only durable
outputs (pose file, PLY).  Here, a checkpoint captures everything needed to
resume tracking mid-sequence or to feed the distributed BA: the pose graph
(as arrays), the current keyframe tensors, the past-frame voting ring and
the motion prior.  Storage via orbax when available, with an npz fallback
(orbax is baked into the environment but the fallback keeps the module
dependency-light for tests).
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class VOCheckpoint:
    """Serializable VO state snapshot."""

    # Pose graph as arrays (suitable for optimize_pose_graph).
    T_kf_curr: np.ndarray  # (N, 4, 4)
    T_w_kf: np.ndarray  # (N, 4, 4)
    timestamps: np.ndarray  # (N,)
    is_keyframe: np.ndarray  # (N,) bool
    # Tracker state.
    kf_structs: list  # per level (H, W, 3)
    kf_T_w: np.ndarray  # (4, 4)
    past_points: np.ndarray  # (K, P, 3) rolling ring
    past_valid: np.ndarray  # (K, P)
    past_poses: np.ndarray  # (K, 4, 4)
    past_n: int
    voting_points: np.ndarray  # (K, P, 3) frozen voting set
    voting_valid: np.ndarray  # (K, P)
    voting_poses: np.ndarray  # (K, 4, 4)
    voting_n: int
    R: np.ndarray  # (3, 3) current init guess
    t: np.ndarray  # (3,)
    T_nm1_n: np.ndarray  # (4, 4)
    just_added_kf: bool
    n_frames: int
    n_keyframes: int


def capture(vo) -> VOCheckpoint:
    """Snapshot a system.VOSystem (device arrays pulled to host)."""
    pg = vo.pose_graph
    return VOCheckpoint(
        T_kf_curr=np.stack([n.T_kf_curr for n in pg])
        if pg
        else np.zeros((0, 4, 4), np.float32),
        T_w_kf=np.stack([n.T_w_kf for n in pg])
        if pg
        else np.zeros((0, 4, 4), np.float32),
        timestamps=np.array([n.timestamp for n in pg]),
        is_keyframe=np.array([n.is_keyframe for n in pg], bool),
        kf_structs=[np.asarray(s) for s in vo.kf.structs]
        if vo.kf is not None
        else [],
        kf_T_w=np.asarray(vo.kf.T_w_k)
        if vo.kf is not None
        else np.eye(4, dtype=np.float32),
        past_points=np.asarray(vo.past.points),
        past_valid=np.asarray(vo.past.valid),
        past_poses=np.asarray(vo.past.poses),
        past_n=int(vo.past.n),
        voting_points=np.asarray(vo.past_voting.points),
        voting_valid=np.asarray(vo.past_voting.valid),
        voting_poses=np.asarray(vo.past_voting.poses),
        voting_n=int(vo.past_voting.n),
        R=np.asarray(vo.R),
        t=np.asarray(vo.t),
        T_nm1_n=np.asarray(vo.T_nm1_n),
        just_added_kf=vo.just_added_kf,
        n_frames=vo.n_frames,
        n_keyframes=vo.n_keyframes,
    )


def save(path: str, ckpt: VOCheckpoint) -> None:
    """Write the checkpoint (orbax if importable, else npz)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {
        "T_kf_curr": ckpt.T_kf_curr,
        "T_w_kf": ckpt.T_w_kf,
        "timestamps": ckpt.timestamps,
        "is_keyframe": ckpt.is_keyframe,
        "kf_T_w": ckpt.kf_T_w,
        "past_points": ckpt.past_points,
        "past_valid": ckpt.past_valid,
        "past_poses": ckpt.past_poses,
        "voting_points": ckpt.voting_points,
        "voting_valid": ckpt.voting_valid,
        "voting_poses": ckpt.voting_poses,
        "R": ckpt.R,
        "t": ckpt.t,
        "T_nm1_n": ckpt.T_nm1_n,
        "scalars": np.array(
            [
                ckpt.past_n,
                ckpt.voting_n,
                int(ckpt.just_added_kf),
                ckpt.n_frames,
                ckpt.n_keyframes,
                len(ckpt.kf_structs),
            ]
        ),
    }
    for i, s in enumerate(ckpt.kf_structs):
        arrays[f"kf_struct_{i}"] = s
    np.savez_compressed(path, **arrays)


def load(path: str) -> VOCheckpoint:
    z = np.load(path)
    (past_n, voting_n, just_added, n_frames, n_keyframes,
     n_structs) = z["scalars"]
    return VOCheckpoint(
        T_kf_curr=z["T_kf_curr"],
        T_w_kf=z["T_w_kf"],
        timestamps=z["timestamps"],
        is_keyframe=z["is_keyframe"],
        kf_structs=[z[f"kf_struct_{i}"] for i in range(int(n_structs))],
        kf_T_w=z["kf_T_w"],
        past_points=z["past_points"],
        past_valid=z["past_valid"],
        past_poses=z["past_poses"],
        past_n=int(past_n),
        voting_points=z["voting_points"],
        voting_valid=z["voting_valid"],
        voting_poses=z["voting_poses"],
        voting_n=int(voting_n),
        R=z["R"],
        t=z["t"],
        T_nm1_n=z["T_nm1_n"],
        just_added_kf=bool(just_added),
        n_frames=int(n_frames),
        n_keyframes=int(n_keyframes),
    )


def save_scan_state(path: str, state) -> None:
    """Checkpoint a device-resident scan state (parallel.batch.ScanVOState
    pytree) — every leaf keyed by its pytree path, so restore is
    structure-checked against a template built from the config."""
    from jax.tree_util import keystr, tree_flatten_with_path

    flattened, _ = tree_flatten_with_path(state)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for kp, v in flattened:
        a = np.asarray(v)
        if str(a.dtype) == "bfloat16":
            # npz has no bf16: store the raw bits; load_scan_state views
            # them back through the template leaf's dtype.
            a = a.view(np.uint16)
        arrays[keystr(kp)] = a
    np.savez_compressed(path, **arrays)


def load_scan_state(path: str, cfg):
    """Restore a ScanVOState saved by save_scan_state.

    The pytree structure comes from ``scan_state_template(cfg)`` — the
    config must match the one the state was captured under (same shapes,
    same scan_relocalization setting)."""
    import jax
    import jax.numpy as jnp
    from jax.tree_util import keystr, tree_flatten_with_path

    from revo_tpu.parallel.batch import scan_state_template

    template = scan_state_template(cfg)
    flattened, treedef = tree_flatten_with_path(template)
    z = np.load(path)
    leaves = []
    for kp, tmpl in flattened:
        key = keystr(kp)
        if key not in z:
            raise KeyError(
                f"checkpoint {path} missing leaf {key} — config mismatch?"
            )
        arr = z[key]
        if str(jnp.result_type(tmpl)) == "bfloat16":
            import ml_dtypes

            arr = arr.view(ml_dtypes.bfloat16)
        if arr.shape != np.shape(tmpl):
            raise ValueError(
                f"leaf {key}: checkpoint shape {arr.shape} != config "
                f"shape {np.shape(tmpl)}"
            )
        leaves.append(jnp.asarray(arr))
    return jax.tree.unflatten(treedef, leaves)


def restore(vo, ckpt: VOCheckpoint, frame_for_kf=None) -> None:
    """Restore a VOSystem from a checkpoint.

    The keyframe's *structures* are restored exactly; the embedded keyframe
    Frame (only needed for a later promotion of that same frame, which
    cannot happen again) is taken from ``frame_for_kf`` or left as the next
    processed frame's predecessor.
    """
    import jax.numpy as jnp

    from revo_tpu.frontend import Keyframe
    from revo_tpu.system import PoseNode
    from revo_tpu.tracker import PastFrames

    vo.pose_graph = [
        PoseNode(
            T_kf_curr=ckpt.T_kf_curr[i],
            T_w_kf=ckpt.T_w_kf[i],
            timestamp=float(ckpt.timestamps[i]),
            is_keyframe=bool(ckpt.is_keyframe[i]),
        )
        for i in range(len(ckpt.timestamps))
    ]
    from revo_tpu import ops as _ops

    _structs = tuple(jnp.asarray(s) for s in ckpt.kf_structs)
    vo.kf = Keyframe(
        structs=_structs,
        quads=tuple(
            _ops.quad_structure(s, vo.cfg.tracker.optimizer.quad_form)
            for s in _structs
        ),
        frame=frame_for_kf,
        T_w_k=jnp.asarray(ckpt.kf_T_w),
    )
    vo.past = PastFrames(
        points=jnp.asarray(ckpt.past_points),
        valid=jnp.asarray(ckpt.past_valid),
        poses=jnp.asarray(ckpt.past_poses),
        n=jnp.int32(ckpt.past_n),
    )
    vo.past_voting = PastFrames(
        points=jnp.asarray(ckpt.voting_points),
        valid=jnp.asarray(ckpt.voting_valid),
        poses=jnp.asarray(ckpt.voting_poses),
        n=jnp.int32(ckpt.voting_n),
    )
    vo.R = jnp.asarray(ckpt.R)
    vo.t = jnp.asarray(ckpt.t)
    vo.T_nm1_n = ckpt.T_nm1_n
    vo.just_added_kf = ckpt.just_added_kf
    vo.n_frames = ckpt.n_frames
    vo.n_keyframes = ckpt.n_keyframes
    vo.prev_frame = frame_for_kf
