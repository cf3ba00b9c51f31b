"""Configuration surface for the framework.

The reference hard-codes every knob (survey §5 lists the full set:
src/main.cpp:243-307, CudaSift/cudaSiftD.h:8-42, SfM/sfm.cu:95,220,50-52);
here they are explicit dataclasses, hashable so they can be passed as
static args to jitted pipelines.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SiftConfig:
    """SIFT frontend (reference defaults: src/main.cpp:269-277)."""

    num_octaves: int = 5
    num_scales: int = 5          # NUM_SCALES (cudaSiftD.h:8)
    init_blur: float = 1.5       # prefilter sigma (src/main.cpp:269)
    thresh: float = 1.0          # DoG threshold, 0..255 intensity scale
    edge_limit: float = 10.0     # tr^2 < limit*det (cudaSiftH.cu:213)
    lowest_scale: float = 0.0    # min accepted blob scale
    up_scale: bool = False       # 2x upscale path (cudaSiftH.cu:119-133)
    max_pts_per_octave: int = 1024   # capacity replacing atomic append
    orientation_duplicates: bool = True  # 2nd-peak duplication (cudaSiftD.cu:1041)
    laplace_radius: int = 4      # LAPLACE_R (cudaSiftD.h:40)
    lowpass_radius: int = 4      # LOWPASS_R (cudaSiftD.h:44)
    use_pallas: bool | None = None  # None = auto (Pallas kernels on TPU)
    # Slot cap for the sampling stage (orientation/descriptor kernels
    # and the descriptor matmuls downstream all scale with SLOTS): the
    # per-octave top-k capacities sum to num_octaves*max_pts_per_octave
    # but real images fill a fraction.  0 = no cap.  2048 (the r2
    # value) silently cost ~20% of the dino pair's matches; 2560 keeps
    # the full match set at +1.0 ms/pair (r3 device sweep,
    # tools/exp_quality.py).
    sample_cap: int = 2560
    # Pyramid blur as banded matmuls instead of grouped convs: the conv
    # path is overhead-bound on TPU (~9 ms/image for ~120 MFLOP); the
    # matmul path rides the MXU.  None = auto (matmul on TPU).
    blur_matmul: bool | None = None
    # Fused-Pallas dense detection (ops/pallas_detect.py): blur bank +
    # DoG + NMS + quadratic refinement in one VMEM-resident kernel per
    # octave; the DoG volume never touches HBM.  None = auto (ON for
    # TPU: r3 device A/B measured 38.2 -> 11.1 ms for the dense stage
    # at the up-scale capacity class with exactly equal detection
    # counts, 0.73 -> <0.1 ms at the dino config; CPU keeps the XLA
    # path, bridged by the interpret-mode parity tests).
    fused_detect: bool | None = None
    # Pallas base chain (ops/pallas_pyramid.py): lowpass prefilter and
    # blur+decimate octave descent as bandwidth-bound kernels instead
    # of the banded matmuls (~80x redundant FLOPs at HIGH precision —
    # ~8 ms/image of the up-scale detect stage, r4 device profile).
    # None = auto (on whenever the fused detect path runs on TPU).
    pyramid_pallas: bool | None = None
    # Windowed-DMA sampling kernel (pallas_sample.fused_orient_
    # descriptor_win): the atlas stays in HBM and each keypoint streams
    # a 128-aligned [48, 256] window via async copy, replacing the
    # full-atlas VMEM block + full-width lane rotate of the r3 kernel.
    # None = auto (OFF), True/"hbm" = stream windows from HBM (the r4
    # A/B measured the HBM form SLOWER at up_t2.0 — 10.11 vs 8.77 ms —
    # DMA latency per keypoint), "vmem" = keep the atlas VMEM-resident
    # like the default kernel but window-copy [48, 256] per keypoint
    # VMEM->VMEM, shrinking the lane rotate from full atlas width
    # (the rotate alone measured ~4.5 ms of the 9.5 ms kernel at
    # up_t2.0 — phase0, tools/exp_sample_phase.py).
    sample_window: bool | str | None = None
    # LEAN detect kernel (ops/pallas_detect.py lean=True): the dense
    # kernel emits 11 raw refinement coefficients and the quadratic
    # solve (divisions + exp2) runs post-top-k in XLA on the K gathered
    # candidates only.  None = auto (lean when lowest_scale == 0, i.e.
    # no dense scale gate is needed); False pins the r3 in-kernel
    # refinement.
    detect_lean: bool | None = None
    # Candidate-selection mode for detect:
    #   "topk"    exact lax.top_k (default) — strongest-first under
    #             capacity pressure;
    #   "approx"  approx_max_k — 5x faster in isolation but 7x SLOWER
    #             fused into the frontend program (r1: +31 ms vs +4 ms);
    #   "compact" O(n) cumsum compaction in scan order — the
    #             reference's append semantics (cudaSiftD.cu:1420);
    #             keeps ARBITRARY candidates when an octave saturates.
    select: str = "topk"
    # Second-peak (duplicate) descriptors as a SEPARATE compacted
    # kernel launch instead of the fused kernel's per-keypoint gated
    # branch: the gated branch runs in narrow [1, S] layout and
    # measured 2.0 ms of the 9.5 ms kernel at up_t2.0 for ~12%%
    # duplicates (tools/exp_sample_phase.py phase4->5); the split
    # compacts duplicates and batches them wide through
    # descriptor_sample at ~0.3 ms.  None = auto (on with Pallas).
    dup_split: bool | None = None
    # PROFILING ONLY: truncate the fused sampling kernel after phase
    # 0 (patch loads/rolls), 1 (+ orientation dots), 2 (+ orientation
    # post), 3 (+ descriptor dots), or 4 (+ descriptor post); 5 =
    # full kernel (the only production value).  Outputs are garbage
    # below 5 — used by
    # tools/exp_sample_phase.py, which cannot jit the kernel
    # standalone (the 43 MB atlas operand OOMs scoped VMEM outside
    # the production program shape).
    sample_phases: int = 5
    # Optional PER-OCTAVE detection slot caps (overrides
    # max_pts_per_octave when set; length must equal num_octaves).
    # Detection counts fall roughly 2x per octave (up_t2.0: 4096/4096/
    # 1895/722/247 — diag_counts r5), while a uniform cap makes every
    # octave pay top-k + aux-gather + sample-slot cost for its full
    # capacity; the select-tail gathers alone were ~2.3 ms of the
    # up-scale extract.  None = uniform caps.
    octave_caps: tuple | None = None
    # Keypoints per program of the fused sampling kernel: the r5 phase
    # decomposition measured ~0.9 us of launch overhead per program
    # (phase-1 = 1.87 ms at 2048 programs, up_t2.0) — larger blocks
    # amortize it and widen the batched post-processing.  VMEM holds
    # block_k patches ([48, 256] f32 each) live.  Device A/B at
    # up_t2.0 (tools/exp_blockk.py): 8/16/32/48/64 -> 16.54 / 14.95 /
    # 14.27-14.55 / 16.8 / 14.22-14.30 ms/extract (two runs).
    sample_block_k: int = 64
    # Block size of the exact 2-level top-k prefilter
    # (detect._topk_2level): lax.top_k cost ~ level1 n/b + level2 k*b,
    # balanced at b ~ sqrt(n/k).  8 = the r3 value; the r4 device sweep
    # at the up-scale capacity class is in NOTES_R4.
    topk_block: int = 32


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    """Brute-force matcher (reference CudaSift/matching.cu:1090-1206)."""

    max_ambiguity: float = 0.95  # ratio-test cutoff (ImproveHomography uses 0.95)
    min_score: float = 0.0       # min correlation of best match
    mutual: bool = False         # cross-check (not in reference)
    # Pallas fused-top2 matcher (score matrix never leaves VMEM) with
    # bf16 MXU tiles; None = auto (on for TPU).  bf16 score error
    # ~4e-3 relative — argmax agreement vs f32 > 99.9% (tests).
    use_pallas: bool | None = None
    bf16: bool = True


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """Essential-matrix RANSAC (reference SfM/sfm.cu:94-236)."""

    n_hyps: int = 4096           # reference: floor(N/8) (sfm.cu:95)
    threshold: float = 1e-6      # symmetric epipolar dist^2, normalized coords
    chunk: int = 512
    refit_iters: int = 2
    # Jacobi sweep count for the fixed-sweep eigensolvers (svd3x3
    # method="jacobi" / triangulate solver="jacobi" — the DEFAULTS
    # since the r2 device A/B reversed the closed-form rewrite,
    # tools/exp_solver_ab.py).  The analytic closed-form paths ignore
    # it.
    sweeps: int = 10
    # Degenerate-configuration rejection: matches with pixel disparity
    # below this satisfy x^T E x = 0 for ANY skew-symmetric E (static
    # background on turntable data), poisoning the vote with a
    # near-identity solution.  The reference has no such guard and its
    # RANSAC can land on the degenerate branch nondeterministically.
    min_disparity_px: float = 1.5


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    sift: SiftConfig = SiftConfig()
    match: MatchConfig = MatchConfig()
    ransac: RansacConfig = RansacConfig()
    refine_iters: int = 10       # on-manifold pose refinement (beyond reference)
    # Refine <-> re-vote <-> re-score rounds.  The Sampson polish and
    # the cheirality vote interact: near the bas-relief ridge a single
    # round can land on a pose where many epipolar inliers fail the
    # depth test (r3: 33-55% of inliers on some seeds).  Each round
    # re-weights the refinement by the CHEIRALITY-CONSISTENT inliers of
    # the previous one, and the final result is the best round by
    # valid-point count (branchless select; round 1 reproduces the
    # single-round behavior, so extra rounds can only gain).
    # 3 rounds (r3 device sweep, tools/exp_quality.py): +0.7 ms/pair
    # over 2 rounds but the worst RANSAC seed goes 614 -> 833 valid
    # points / 3.0 -> 1.0 px; fewer GN iters per round (it6) cannot
    # rescue that seed (513 valid), so rounds buy what iterations
    # cannot.  r4: the translation re-vote (tvote_rounds below) rescues
    # the bad-seed tail far better than a 3rd round — the default
    # dropped to 2 rounds + 2 votes (8-seed CPU study: min valid
    # 688 -> 1017, max px 0.62 -> 0.49; NOTES_R4).
    refine_rounds: int = 2
    # Translation re-vote rounds after the refine rounds (r4): on
    # rotation-dominant pairs the Sampson objective is flat in t, and
    # local refinement gets stuck in valleys whose recovered pose puts
    # hundreds of inliers behind a camera.  Each round globally
    # searches the t-sphere for the max-cheirality direction given the
    # best round's R (geometry.pose.cheirality_t_vote — two matmuls
    # over a Fibonacci bank), enters the voted E as a candidate, and
    # re-refines from the voted pose; a final vote-only half round
    # always follows.  0 disables both.  Default 1 (device 8-seed A/B
    # NOTES_R4: with the top-K restart, round 2 bought +75 min-valid
    # for +0.68 ms; the half round recovers most of it for ~0.1 ms).
    tvote_rounds: int = 1
    # Size of the direction bank (1024 needed: one CPU-study seed's
    # good basin is missed at 512 — NOTES_R4).
    tvote_dirs: int = 1024
    # Round-selection tightening: candidates are ranked by the count of
    # inliers at threshold * score_tight_mult (lexicographically above
    # the full valid count).  The full RANSAC threshold (~4 px at the
    # dino intrinsics) is loose enough that a geometrically bad basin
    # can admit MORE loose inliers than the true pose (device seed
    # study, NOTES_R4); the tight count separates the basins.  0
    # disables (pure valid-count ranking).
    score_tight_mult: float = 0.25
    # Multi-start refinement: score all 4 pose branches of the LO-refit
    # E plus the top-restart_k RANSAC bank draws (tight-count metric,
    # batched closed-form cheirality) and start the refine rounds from
    # the argmax.  The single best draw's basin is wrong on ~1/4 of
    # seeds (device study NOTES_R4) and no post-hoc vote rescues a bad
    # R.  0 = single-start cheirality vote (r3 behavior).
    restart_k: int = 16
    # Probe refinement (r5): the pre-refinement tight score is a weak
    # predictor of the post-refinement basin — on tail seeds the argmax
    # start converges to a local optimum while a slightly lower-scored
    # start reaches the global basin (CPU 8-seed study at HEAD r4:
    # seed 4 landed at 824/0.60 px vs the 1071/0.33 basin).  Instead of
    # refining only the argmax, probe-refine the best pose branch of
    # each of the top probe_starts E candidates with a short vmapped GN
    # (probe_iters) and START the full rounds from the post-probe
    # argmax.  0/1 disables (r4 argmax behavior).
    probe_starts: int = 8
    probe_iters: int = 6
    # Compact correspondences to this many slots before the geometry
    # program (valid entries first).  The keypoint capacity is
    # num_octaves * 2 * max_pts_per_octave slots (10240 in the bench
    # config) while a real pair yields ~1.2k matches, so RANSAC
    # scoring / triangulation over raw slots wastes ~8x of their
    # bandwidth.  0 disables (geometry runs at full capacity).
    geometry_cap: int = 2560
    # Correspondence subset for the FIRST cheirality vote (the one that
    # merely picks a branch + seeds refinement; the final vote and
    # triangulation always use every point).  Branch-picking is a 4-way
    # majority over inlier-weighted depths — a few hundred compacted
    # (valid-first) slots decide it identically while skipping ~75% of
    # the per-round recover_pose's 4xN DLT solves (r3 device A/B:
    # -0.31 ms, bit-identical output).  0 = all points.
    vote_cap: int = 512
