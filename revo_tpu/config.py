"""Configuration dataclasses for the TPU-native REVO framework.

Mirrors the reference's two-file YAML config split (algorithm settings +
dataset/sensor settings) parsed by ``REVOConfig`` (system.h:32-83),
``TrackerSettings`` (tracker.h:31-55), ``ImgPyramidSettings``
(camerapyr.h:27-89), ``IOWrapperSettings`` (iowrapperRGBD.h:41-153) and
``OptimizerSettings`` (optimizer.h:42-112), with per-key defaults identical to
the reference.  Everything is a frozen dataclass so configs hash cleanly as
jit static arguments; array-valued derived quantities live in separate pytrees.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import yaml


@dataclass(frozen=True)
class CameraConfig:
    """Pinhole intrinsics of the full-resolution camera (camerapyr.h:90-111)."""

    fx: float = 517.306408  # defaults: TUM freiburg1 (config/dataset_tum1.yaml)
    fy: float = 516.469215
    cx: float = 318.643040
    cy: float = 255.313989
    width: int = 640
    height: int = 480
    # Radial/tangential distortion (k1, k2, p1, p2, k3); used only when
    # undistort=True (camerapyr.h:125-137).
    distortion: Tuple[float, float, float, float, float] = (0.0,) * 5

    def level(self, lvl: int) -> "CameraConfig":
        """Per-level intrinsics: scale = 2**-lvl (camerapyr.h:140-144).

        Note the reference scales cx,cy by the plain factor (no half-pixel
        shift), and truncates width/height.
        """
        s = 1.0 / (2 ** lvl)
        return dataclasses.replace(
            self,
            fx=self.fx * s,
            fy=self.fy * s,
            cx=self.cx * s,
            cy=self.cy * s,
            width=int(self.width * s),
            height=int(self.height * s),
        )


@dataclass(frozen=True)
class PyramidConfig:
    """Pyramid + edge-extraction settings (ImgPyramidSettings, camerapyr.h:27-89)."""

    canny_threshold1: float = 150.0  # camerapyr.h:40
    canny_threshold2: float = 100.0  # camerapyr.h:41
    gaussian_before_canny: bool = False  # DO_GAUSSIAN_SMOOTHING_BEFORE_CANNY
    depth_min: float = 0.1  # camerapyr.h:43
    depth_max: float = 5.2  # camerapyr.h:44
    pyr_min_lvl: int = 2  # coarsest level tracked (camerapyr.h:45)
    pyr_max_lvl: int = 0  # finest level tracked (camerapyr.h:46)
    undistort: bool = False
    use_edge_hist: bool = True  # BMVC17 edge fill-in (camerapyr.h:62)
    # Edge-cloud stream compaction: "rank" = per-slot rank-select (block
    # summaries located by a scatter-bincount + MXU ones-triangle cumsum,
    # depth fused into the final (capacity,)-row take), "scatter" = cumsum
    # + per-pixel scatter (XLA's TPU scatter serializes over all H*W
    # lanes: 2.6 ms for level 0 alone single-seq).  The original rank form
    # lost single-seq (10.0 vs 8.0 ms/step); after the bincount locator,
    # triangular-matmul cumsum and fused depth it wins BOTH contexts
    # (v5e ab_track: rank 3.64 ms/step vs scatter 6.78; ab_batch B=8
    # rank 18.0 ms).  "rank_sort" further replaces the in-block one-hot
    # rank->position contraction (O(BLK^2) multiply-reduces per block,
    # the largest frontend fusion at B=8) with a lane sort keyed on the
    # in-block cumsum — measured 7.34 -> 6.46 ms/vary-chained-step at B=8
    # cap50, 9.5 ms at exact-fit vs 10.9 (scripts/probes/ab_table.py).
    # "rank_sort2" packs the lane index into the sort key's low byte
    # (key*256 + lane, < 2^24 so f32-exact) so the sort carries one fewer
    # operand.  All four forms are bit-identical (fuzz-gated in test_ops);
    # rank_sort2 measured device step 7.31 vs 7.41 ms at B=8 (trace_batch,
    # sorts 0.73 -> 0.62 ms) and is the default.
    compaction: str = "rank_sort2"
    n_percentage: float = 0.3  # occupancy threshold for fill-in
    # Patch sizes of the per-level edge-occupancy histogram; "chosen in a way
    # that we always get 32x24 patches for 3 levels starting from 640x480"
    # (imgpyramidrgbd.cpp:50).
    dist_patch_sizes: Tuple[int, ...] = (20, 10, 5)
    # Fixed capacity of the per-level edge point cloud (TPU static shapes;
    # replaces the dynamic leftCols() of imgpyramidrgbd.cpp:226).
    edge_capacity: Tuple[int, ...] = (16384, 8192, 4096)
    # On TPU, run Canny as the fused Pallas kernel (3x faster than the XLA
    # composition and closer to OpenCV under the platform's forced
    # --xla_allow_excess_precision: 30 vs 569 differing pixels at 640x480).
    use_pallas_canny: bool = True

    @property
    def n_levels(self) -> int:
        return self.pyr_min_lvl - self.pyr_max_lvl + 1  # camerapyr.h:68-71


@dataclass(frozen=True)
class OptimizerConfig:
    """LM/GN schedule (OptimizerSettings, optimizer.h:42-112)."""

    lambda_success_fac: float = 0.5  # optimizer.h:53
    lambda_fail_fac: float = 2.0  # optimizer.h:54
    lambda_initial: Tuple[float, ...] = (0.0,) * 6  # optimizer.h:63
    step_size_min: Tuple[float, ...] = (1e-16,) * 6  # optimizer.h:55
    convergence_eps: Tuple[float, ...] = (0.999,) * 6  # optimizer.h:65
    max_its_per_lvl: Tuple[int, ...] = (100,) * 6  # optimizer.h:56
    edge_distance_lvl: Tuple[float, ...] = (30, 20, 10, 5, 5, 5)  # optimizer.h:59
    max_inc_try: int = 10  # optimizer.h:69
    huber_edge: float = 0.3  # optimizer.h:75
    use_edge_filter: bool = True  # revo_settings.yaml USE_EDGE_FILTER
    # Solver implementation: "lm" reproduces the reference's data-dependent
    # accept/reject schedule (optimizer.cpp:250-307) with nested while_loops;
    # "gn_fixed" is the TPU-fast fixed-iteration variant (SURVEY.md §7
    # design stance): one evaluation per iteration, where-gated accept, LM
    # damping halved/quadrupled — same fixed point, ~3x fewer device loop
    # iterations.  ATE parity is gated in tests/test_solver_modes.py.
    solver: str = "lm"
    # Per-level gn_fixed iteration counts, index 0 = finest.  The solve is
    # coarse-to-fine, so by the finest (most expensive) level the pose is
    # nearly converged: 6 its at L0 measured ATE-identical to 12 (0.970 mm
    # to 1 um on the bench chain; scripts/probes/ab_iters.py, schedules
    # 12,12,12 / 8,* / 6,* all 0.970) while saving the most costly evals.
    # Gated by the gn-vs-lm parity battery (test_solver_modes).
    fixed_iters: Tuple[int, ...] = (6, 10, 12, 12, 12, 12)  # per level
    # Accumulate the 6x6 normal equations with the Pallas LGSX reduction
    # kernel (ops/pallas/lgsx.py) instead of XLA einsums.
    use_pallas_lgsx: bool = False
    # Bilinear-sampling gather formulation for the residual pass.  XLA's
    # TPU gather emitter choice is context-dependent (the windowed form is
    # 60x faster in isolation but ~30x slower inside the tracker step), so
    # the implementation is a measured knob: "quad" (ONE row take from the
    # keyframe's packed (H, W, 12) 2x2-neighborhood table — the row-gather
    # cost is per-index overhead, not bytes, so packing quarters it;
    # measured 12.6 -> 10.7 ms/step on v5e, ab_track), "take4" (four row
    # takes), "taps"/"window"/"pair" (lax.gather slice forms); "quad_lf"
    # routes the same quad sample through the lane-fold custom_vmap take
    # (interp._take_rows_lanefold) — bit-identical to "quad" (gated in
    # test_ops), neutral single-seq (3.58 vs 3.54 ms/step), and the
    # measured winner for the BATCHED emitter (ab_batch B=8 re-
    # adjudication on the fixed use_quad gate: lf 12.7 ms/batched-step
    # vs quad 17.4, fr 14.8, ob 17.6, lf12 58.5).
    bilinear_impl: str = "quad_lf"
    # Storage layout of the packed quad table (ops.edt.quad_structure):
    # "hw12" (H, W, 12), "flat" (H*W, 12), "t" (12, H*W), "flat16"
    # (H*W, 16) padded, "flatbf" (H*W, 12) bfloat16, "dt4"/"dt4bf"
    # (H*W, 4) dt-only taps with the Jacobian gradient derived from the
    # bilinear dt surface (interp.bilinear_sample_dtquad).  Measured
    # emitter knob: the batched step's gather cost is index-count x
    # row-bytes sensitive down to ~16-byte rows — bf16 12-component rows
    # nearly halved it (ab_batch B=8: flatbf 28.3 ms/batched-step vs
    # flat 47.4, flat16 54.5) and the dt-only rows cut it again (dt4bf
    # 20.0 vs flatbf 25.7 with the fused-depth compaction; dt4 == dt4bf,
    # so 16 B/row is already at the per-index floor ~4 ns.  ab_track
    # single-seq: dt4bf 6.78 ms/step vs flatbf 7.57).  Residuals are
    # bit-identical across forms (modulo bf16 rounding); dt4's surface
    # gradient is the exact GN linearization of the sampled interpolant
    # and is ATE-parity gated (test_solver_modes, test_ops).  "flatbf"
    # remains the reference central-difference-gradient form; f32 "flat"
    # for exact-reference numerics.
    quad_form: str = "dt4bf"
    # Lane-select form for the fold-hoisted batched solve (solver.
    # gn_level_fixed): with the B per-sequence dt4 tables pre-folded into
    # one shared operand outside the while loop, each vmapped lane must
    # pick its own sequence's 4 components per gathered row.  "onehot"
    # keeps the full (H*W, B*4) row per gather and selects with an exact
    # one-hot multiply-reduce — the gathered row and the (N, B, 4) select
    # intermediate both grow with B (the documented remaining B=32
    # superlinearity, STATUS round-3).  "flat" folds the lane into the
    # gather index instead: table reshaped (H*W*B, 4) outside the loop,
    # row index = base*B + lane — same single-index 2-D gather form, one
    # 4-component row per point, no select at all.  Bit-identical
    # (selects the same stored values; gated in test_solver_modes).
    # MEASURED A LOSS on v5e at B=8 (trace_batch, 2026-08-20): device
    # step 10.97 ms vs 6.97 onehot — the in-loop gather emits ~2.2 ns/row
    # for narrow 8-byte rows from the (H*W*B, 4) operand vs 0.87 ns/row
    # for the wide (1, B*4) slice; the one-hot select is nearly free at
    # B=8.  Fourth failed reformulation of this gather (interp.py:93
    # lists the other three); kept as a documented A/B knob.
    lane_select: str = "onehot"
    # SE(3) point-projection arithmetic inside the residual pass.  "fma"
    # (default): nine scalar-broadcast f32 FMAs — exact f32; on v5e this
    # HALVES tracking ATE vs the bf16 MXU default (2.06 -> 0.97 mm,
    # scripts/probes/ab_precision.py) at ~0.5 ms/step B=8 (device 6.85 ->
    # 7.41 ms; Precision.HIGH 8.13 and an optimization_barrier'd FMA 7.46
    # were both measured worse).  "bf16": the plain MXU matmul — the
    # throughput point when mm-level ATE is not required.
    proj_impl: str = "fma"
    # 6x6 damped-normal-equation solve: "ldlt" = unrolled pivot-free LDL^T
    # (straight-line code; jnp.linalg.solve's general LU lowers to a serial
    # while loop on TPU), "linalg" = jnp.linalg.solve.
    solve6_impl: str = "ldlt"


@dataclass(frozen=True)
class TrackerConfig:
    """Tracker settings (TrackerSettings, tracker.h:31-55)."""

    check_init_values: bool = True  # tracker.h:43
    # Improvement over the reference: evalCostFunction (tracker.cpp:356-393)
    # compares raw DT sums, so a pose that throws points out of bounds gets a
    # spuriously low cost; normalizing by the contributing-point count fixes
    # the bias.  Set False for exact reference parity.
    normalized_init_cost: bool = True
    # Improvement over the reference: checkInitializationValues discards the
    # motion prior whenever cost(identity) < cost(prior) — a RAW comparison
    # (tracker.cpp:277-282).  On quasi-periodic structure the two can sit
    # within noise of each other (measured failure: costs 0.5589 vs 0.5615,
    # true pose 0.5529 — the identity reset locked tracking into an aliased
    # basin 15 cm off for the rest of the sequence).  Require identity to be
    # CLEARLY better: use_eye iff cost_eye < margin * cost_prior.  A truly
    # broken prior loses by far more than 10%; 1.0 = exact reference
    # behavior.  ATE-gated in tests/test_system.py (seed-9 long run).
    init_check_margin: float = 0.9
    check_tracking_results: bool = True  # tracker.h:45
    n_frames_histogram_voting: int = 3  # tracker.h:44,47
    histogram_level: int = 2  # tracker.cpp:229
    # Weighted-overlap weights for counting levels 0..3 (tracker.cpp:230-234).
    hist_weights: Tuple[float, ...] = (0.0, 1.0, 1.25, 1.5)
    # Final good/bad ratio below which a new keyframe is requested
    # (tracker.cpp:351).
    good_bad_ratio_new_kf: float = 4.0
    # Relocalization — the reference declares TRACKER_STATE_LOST but leaves
    # relocalization unimplemented (tracker.h:62-65); we implement it: when
    # the final mean weighted error exceeds the threshold (or too few good
    # points survive), the frame is re-tracked against the recent-keyframe
    # ring from identity and the best result re-anchors tracking.
    enable_relocalization: bool = True
    # Catastrophic pose-jump gate (improvement over the reference, which
    # has no failure detection at all): a frame-to-frame motion beyond
    # these bounds is treated as lost — the residual alone cannot catch a
    # wrong-basin convergence on repetitive structure (it stays low
    # there), but a 0.5 m / 0.8 rad jump at 30 fps is not physical for
    # the handheld/robot regimes this targets.  Recovery = the existing
    # lost path (relocalization ring, else constant-velocity coasting).
    max_jump_translation: float = 0.5  # metres per frame
    max_jump_rotation: float = 0.8  # radians per frame
    reloc_error_threshold: float = 2.0  # mean weighted DT error (px)
    reloc_min_good: int = 100
    kf_history_size: int = 5
    # Keep full image tensors (gray/depth/edges) on RETAINED keyframes.
    # False (default) stores pruned slots — tracking, relocalization,
    # loop closure and windowed BA only read structs/quads/clouds/pose
    # (frontend.prune_keyframe; ~4 MB/slot saved at 640x480).  run.py
    # turns this on for --export-ply / --live-view, which color the map
    # from keyframe images.
    store_kf_images: bool = False
    # Online (mid-run) loop closure: every ``loop_closure_every`` frames
    # the retained keyframe ring is searched for verified revisits and the
    # pose graph + live tracking state are corrected in place (the offline
    # equivalent is run.py --close-loops).  Off by default — odometry
    # parity with the reference; enable for SLAM-mode runs.
    online_loop_closure: bool = False
    # Closure runs on every keyframe promotion (the natural SLAM trigger —
    # a revisit only becomes closable once its keyframe exists) plus a
    # periodic fallback every N frames.
    loop_closure_every: int = 30
    loop_closure_radius: float = 0.8  # candidate search radius (m)
    # Ring relocalization inside the device-resident scan twin
    # (parallel/batch.py).  Default OFF: under plain vmap both lax.cond
    # branches execute every step, so an always-on reloc branch would cost
    # kf_history_size extra tracks per frame in the batched-throughput
    # path.  Enable for shard_map-per-device runs (cond stays a real
    # branch there — zero cost on healthy frames) or host-loop-parity
    # robustness runs.
    scan_relocalization: bool = False
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)


@dataclass(frozen=True)
class DatasetConfig:
    """Dataset / IO settings (IOWrapperSettings, iowrapperRGBD.h:41-153)."""

    main_folder: str = ""
    datasets: Tuple[str, ...] = ()
    associate_file: str = "associate.txt"
    depth_scale_factor: float = 5000.0  # TUM (iowrapperRGBD.cpp:326-327)
    skip_first_n_frames: int = 0  # iowrapperRGBD.h:108
    read_n_images: int = 100000  # iowrapperRGBD.h:109
    use_depth_timestamp: bool = False
    # 0 = dataset files, 1 = Orbbec Astra Pro, 2 = RealSense, 3 = Orbbec
    # Astra (iowrapperRGBD.h:57; live sensors via io/sensors.py).
    input_type: int = 0


@dataclass(frozen=True)
class SystemConfig:
    """Top-level config (REVOConfig, system.h:32-83)."""

    camera: CameraConfig = field(default_factory=CameraConfig)
    pyramid: PyramidConfig = field(default_factory=PyramidConfig)
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    init_from_last_pose: bool = True  # system.h:54 INIT_FROM_LAST_POSE
    do_output_poses: bool = True
    output_folder: str = "out"

    def camera_pyramid(self) -> Tuple[CameraConfig, ...]:
        """Per-level intrinsics for levels 0..n_levels-1 (camerapyr.h:139-144)."""
        return tuple(
            self.camera.level(lvl) for lvl in range(self.pyramid.n_levels)
        )


def _get(d: dict, key: str, default):
    v = d.get(key, default)
    if isinstance(default, bool):
        return bool(v)
    if isinstance(default, int) and not isinstance(default, bool):
        return int(v)
    if isinstance(default, float):
        return float(v)
    return v


def load_config(
    settings_file: Optional[str] = None, dataset_file: Optional[str] = None
) -> SystemConfig:
    """Load the two-file YAML config, mirroring the reference split.

    ``settings_file`` = algorithm settings (config/revo_settings.yaml),
    ``dataset_file`` = camera/dataset settings (config/dataset_tum1.yaml).
    Missing keys fall back to the reference defaults listed above.  The
    reference parses OpenCV FileStorage YAML ("%YAML:1.0" + "key: value");
    we accept both plain YAML and the FileStorage dialect.
    """
    algo: dict = {}
    data: dict = {}
    if settings_file:
        algo = _load_yaml(settings_file)
    if dataset_file:
        data = _load_yaml(dataset_file)

    cam = CameraConfig(
        fx=_get(data, "Camera.fx", 517.306408),
        fy=_get(data, "Camera.fy", 516.469215),
        cx=_get(data, "Camera.cx", 318.643040),
        cy=_get(data, "Camera.cy", 255.313989),
        width=_get(data, "Camera.width", 640),
        height=_get(data, "Camera.height", 480),
        distortion=(
            _get(data, "Camera.k1", 0.0),
            _get(data, "Camera.k2", 0.0),
            _get(data, "Camera.p1", 0.0),
            _get(data, "Camera.p2", 0.0),
            _get(data, "Camera.k3", 0.0),
        ),
    )
    pyr = PyramidConfig(
        canny_threshold1=_get(data, "cannyThreshold1", 150.0),
        canny_threshold2=_get(data, "cannyThreshold2", 100.0),
        gaussian_before_canny=_get(
            data, "DO_GAUSSIAN_SMOOTHING_BEFORE_CANNY", False
        ),
        depth_min=_get(data, "DEPTH_MIN", 0.1),
        depth_max=_get(data, "DEPTH_MAX", 5.2),
        pyr_min_lvl=_get(data, "PYR_MIN_LVL", 2),
        pyr_max_lvl=_get(data, "PYR_MAX_LVL", 0),
        undistort=_get(data, "DO_UNDISTORT", False),
        use_edge_hist=_get(data, "USE_EDGE_HIST", True),
        n_percentage=_get(data, "nPercentage", 0.3),
    )
    opt = OptimizerConfig(
        use_edge_filter=_get(algo, "USE_EDGE_FILTER", True),
    )
    trk = TrackerConfig(
        check_init_values=_get(algo, "CHECK_INIT_VALUES", True),
        check_tracking_results=_get(algo, "CHECK_TRACKING_RESULTS", True),
        n_frames_histogram_voting=_get(
            algo, "N_FRAMES_HIST_VOTING", _get(algo, "nFramesHistogramVoting", 3)
        ),
        # revo_tpu extensions (absent from reference YAMLs; keys are ours).
        enable_relocalization=_get(algo, "ENABLE_RELOCALIZATION", True),
        kf_history_size=_get(algo, "KF_HISTORY_SIZE", 5),
        online_loop_closure=_get(algo, "ONLINE_LOOP_CLOSURE", False),
        loop_closure_every=_get(algo, "LOOP_CLOSURE_EVERY", 30),
        loop_closure_radius=_get(algo, "LOOP_CLOSURE_RADIUS", 0.8),
        optimizer=opt,
    )
    datasets = data.get("Datasets", ())
    if isinstance(datasets, str):
        datasets = (datasets,)
    else:
        datasets = tuple(datasets)
    ds = DatasetConfig(
        main_folder=_get(data, "MainFolder", ""),
        datasets=datasets,
        associate_file=_get(data, "ASSOCIATE", "associate.txt"),
        depth_scale_factor=_get(data, "DEPTH_SCALE_FACTOR", 5000.0),
        skip_first_n_frames=_get(data, "SKIP_FIRST_N_FRAMES", 0),
        read_n_images=_get(data, "READ_N_IMAGES", 100000),
        input_type=int(_get(algo, "INPUT_TYPE", _get(data, "INPUT_TYPE", 0))),
    )
    return SystemConfig(
        camera=cam,
        pyramid=pyr,
        tracker=trk,
        dataset=ds,
        do_output_poses=_get(algo, "DO_OUTPUT_POSES", True),
    )


def _load_yaml(path: str) -> dict:
    """Load plain YAML or OpenCV FileStorage YAML ("%YAML:1.0" header)."""
    with open(path) as f:
        text = f.read()
    # OpenCV FileStorage header is not valid YAML 1.1; strip it.
    if text.startswith("%YAML"):
        text = "\n".join(
            line for line in text.splitlines() if not line.startswith("%YAML")
        )
    loaded = yaml.safe_load(text)
    return loaded or {}
