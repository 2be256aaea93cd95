"""Massively batched RANSAC for essential-matrix estimation (pure JAX).

Replaces the sequential, early-exiting RANSAC loop inside
`cv2.findEssentialMat(method=RANSAC, prob=0.999, threshold=1.0)`
(reference: src/core/pose_estimator.py:522-527) with a fixed-size tensor of
hypotheses evaluated simultaneously:

  1. Sample NUM_HYPOTHESES index sets of size 8 from the valid matches
     (uniform without replacement, via top-k of iid uniform keys).
  2. Solve every minimal sample with the batched 8-point solver in one shot.
  3. Score every hypothesis against every correspondence with a fused
     Sampson-distance kernel -> (H, N) residual matrix.
  4. argmax inlier count -> best model; then a fixed number of least-squares
     refits on the inlier set (replacing OpenCV's implicit polish).

OpenCV adaptively chooses its iteration count from the inlier ratio with
prob=0.999; a fixed H=2048 batch exceeds the iterations OpenCV would run for
any inlier ratio >= ~18% on minimal-8 samples, so the batched version is at
least as strong (see SURVEY.md §7 "RANSAC fidelity without sequential
adaptivity"). There is no data-dependent control flow: shapes are static and
everything jits into one XLA program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .epipolar import eight_point, project_to_essential, sampson_error_sq

_EPS = 1e-12


def sample_minimal_indices(key, valid_mask, num_hypotheses, sample_size=8):
    """Uniform random `sample_size`-draws from the valid correspondences.

    valid_mask: (N,) bool. Returns (H, S) int32 indices. Valid indices are
    compacted to the front (one stable small sort), then each slot draws
    i.i.d. uniform over [0, num_valid). Within-sample duplicates are
    possible but rare (~6% of hypotheses at S=8, N=500) and merely waste
    that hypothesis — the TPU-friendly trade against a per-hypothesis
    rejection loop (OpenCV retries; we oversample hypotheses instead,
    SURVEY.md §7).
    """
    n = valid_mask.shape[0]
    # stable partition: valid indices first
    order = jnp.argsort(jnp.logical_not(valid_mask), stable=True)
    num_valid = jnp.sum(valid_mask.astype(jnp.int32))
    u = jax.random.uniform(key, (num_hypotheses, sample_size))
    slot = jnp.minimum((u * num_valid).astype(jnp.int32),
                       jnp.maximum(num_valid - 1, 0))
    return jnp.take(order, slot)


def _gather_sample(pts, idx):
    """pts (N, 2), idx (H, S) -> (H, S, 2)."""
    return jnp.take(pts, idx, axis=0)


@partial(jax.jit,
         static_argnames=("num_hypotheses", "refit_rounds", "solver",
                          "degensac", "lo"))
def ransac_essential(
    key,
    pts1_n,
    pts2_n,
    valid_mask,
    threshold_n,
    num_hypotheses: int = 2048,
    refit_rounds: int = 2,
    solver: str = "8pt",
    degensac: bool = False,
    lo: bool = False,
):
    """Batched-hypothesis essential matrix RANSAC.

    Args:
      key: jax PRNG key.
      pts1_n, pts2_n: (N, 2) normalized camera coordinates (K^-1 applied).
      valid_mask: (N,) bool — which correspondences are real (static shapes
        require padding; see SURVEY.md §7 static-shape discipline).
      threshold_n: scalar Sampson threshold in *normalized* units
        (pixel_threshold / mean_focal, matching OpenCV's rescaling).
      num_hypotheses: static hypothesis batch size.
      refit_rounds: least-squares refits on the winning inlier set.
      lo: LO-RANSAC local optimization (Lebeda/Chum/Matas, BMVC 2012
        "Fixing the Locally Optimized RANSAC"): a threshold-ANNEALED
        ladder of weighted refits (multipliers 4x -> 2x -> 1.4x -> 1x of
        the inlier threshold) accepted on truncated MSAC loss at the
        FINAL threshold instead of raw inlier count. Annealing first
        pulls near-inliers into the fit so different minimal-sample
        starts descend into the same basin — the per-seed pose spread
        shrinker (round-4 verdict #7: 29/80 salah pairs spread > 1 deg
        across seeds). Runs BEFORE the plain refit rounds; no reference
        counterpart (cv2.findEssentialMat has no polish at all,
        src/core/pose_estimator.py:522-527 — documented-stronger
        deviation, PARITY.md).

    Returns dict with:
      E: (3, 3) best essential matrix (projected to the essential manifold)
      inlier_mask: (N,) bool
      num_inliers: () int32
      ok: () bool — False when fewer than 8 valid matches or no model found.
    """
    n = pts1_n.shape[0]
    num_valid = jnp.sum(valid_mask.astype(jnp.int32))

    if solver == "5pt":
        # Nister minimal solver: up to 10 essential candidates per sample;
        # flatten (H, 10) into one hypothesis axis.
        from .five_point import five_point_essential

        idx = sample_minimal_indices(key, valid_mask, num_hypotheses,
                                     sample_size=5)
        s1 = _gather_sample(pts1_n, idx)            # (H, 5, 2)
        s2 = _gather_sample(pts2_n, idx)
        E_r, root_ok = five_point_essential(s1, s2)  # (H, 10, 3, 3)
        E_h = E_r.reshape(-1, 3, 3)
        hyp_ok = root_ok.reshape(-1)
    else:
        idx = sample_minimal_indices(key, valid_mask, num_hypotheses)
        s1 = _gather_sample(pts1_n, idx)            # (H, 8, 2)
        s2 = _gather_sample(pts2_n, idx)
        E_h = eight_point(s1, s2)                   # (H, 3, 3)
        hyp_ok = jnp.ones(E_h.shape[0], dtype=bool)

    E_h, _, _ = project_to_essential(E_h)           # rank-2 projection

    # Fused scoring: (H, N) Sampson residuals in one shot. Defensive NaN
    # handling: a non-finite residual counts as a miss at full loss.
    d2 = sampson_error_sq(E_h, pts1_n[None], pts2_n[None])  # (H, N)
    thr2 = threshold_n * threshold_n
    d2 = jnp.where(jnp.isfinite(d2), d2, thr2)
    inliers_h = (d2 < thr2) & valid_mask[None, :] & hyp_ok[:, None]
    counts = jnp.sum(inliers_h.astype(jnp.int32), axis=-1)  # (H,)

    # MSAC-style tie-break: among equal counts prefer lower truncated loss.
    # Exact integer lexicographic rank — a float score `counts - eps*trunc`
    # is vacuous in f32 (eps under the mantissa step at counts ~ 7 collapses
    # all ties, and top_k then breaks them by index, preferring whichever
    # imprecise root happens to come first). Rank of trunc within the
    # hypothesis batch is the tie-break key: counts*H - rank(trunc).
    trunc = jnp.sum(jnp.minimum(d2, thr2) * valid_mask[None, :], axis=-1)
    H = trunc.shape[0]
    trunc_rank = jnp.argsort(jnp.argsort(trunc))          # 0 = lowest loss
    score = counts * jnp.int32(H) - trunc_rank.astype(jnp.int32)

    # Cheirality re-rank of the top hypotheses. With few points (minimal
    # N=5 pairs) or ambiguous geometry, several essential roots fit every
    # inlier with ~zero Sampson error and counts/loss cannot separate
    # them; only the true model reconstructs points in front of both
    # cameras (the disambiguation cv2.recoverPose performs downstream,
    # reference pose_estimator.py:522-533). Lexicographic selection:
    # inlier count, then cheirality votes, then MSAC score (top_k returns
    # score-descending order and argmax takes the first maximum).
    from .recover_pose import cheirality_votes

    k = min(8, int(E_h.shape[0]))
    _, top_idx = jax.lax.top_k(score, k)
    # Votes over each hypothesis's OWN inlier set: the consensus points are
    # the ones the model explains, so they — not the outlier majority —
    # should disambiguate its twin rotations (see recover_pose docstring).
    votes_top = jax.vmap(
        lambda Ei, mi: cheirality_votes(Ei, pts1_n, pts2_n, mi)
    )(E_h[top_idx], inliers_h[top_idx])
    sel = counts[top_idx] * jnp.int32(n + 1) + votes_top
    # Break (counts, votes) ties by lowest truncated loss — exact minimal
    # roots and their slightly-off siblings tie on both integer keys, and
    # only the Sampson loss separates them (measured 0.18 deg on noise-free
    # n=7 data when the tie fell to candidate order instead).
    tied_trunc = jnp.where(sel == jnp.max(sel), trunc[top_idx], jnp.inf)
    best = top_idx[jnp.argmin(tied_trunc)]

    E_best = E_h[best]
    inlier_mask = inliers_h[best]

    if lo:
        # Inner resampling (the "LO" in LO-RANSAC): 8 non-minimal
        # (16-point) samples drawn from the winner's inlier set give
        # alternative least-squares starts — the escape hatch from a
        # locally-optimal wrong basin that pure descent (the ladder
        # below) cannot leave. Candidates compete with the winner on
        # truncated MSAC loss; degenerate samples produce high-loss
        # models and lose automatically.
        vmask_f = valid_mask.astype(pts1_n.dtype)
        kin = jax.random.fold_in(key, 11)
        in_idx = sample_minimal_indices(kin, inlier_mask, 8,
                                        sample_size=16)      # (8, 16)
        w_in = jnp.zeros((8, n), pts1_n.dtype).at[
            jnp.arange(8)[:, None], in_idx].set(1.0)
        w_in = w_in * vmask_f[None, :]
        E_in = jax.vmap(
            lambda w: eight_point(pts1_n, pts2_n, weights=w))(w_in)
        E_in, _, _ = project_to_essential(E_in)
        E_cand = jnp.concatenate([E_best[None], E_in], axis=0)  # (9,3,3)
        d2_cand = sampson_error_sq(E_cand, pts1_n[None], pts2_n[None])
        d2_cand = jnp.where(jnp.isfinite(d2_cand), d2_cand, thr2)
        loss_cand = jnp.sum(jnp.minimum(d2_cand, thr2) * vmask_f[None, :],
                            axis=-1)
        ci = jnp.argmin(loss_cand)
        E_best = E_cand[ci]

        # LO ladder: weighted 8pt at annealed thresholds, accepted on
        # truncated MSAC loss at the FINAL threshold (count plateaus are
        # exactly where seeds wander; the truncated loss is strictly
        # finer). The 4x start pulls near-inliers into the normal matrix
        # so distinct minimal-sample basins merge before the final
        # tight-threshold rounds.
        def lo_step(carry, mult):
            E_cur, loss_cur = carry
            d2c = sampson_error_sq(E_cur, pts1_n, pts2_n)
            d2c = jnp.where(jnp.isfinite(d2c), d2c, thr2 * mult)
            w = ((d2c < thr2 * mult) & valid_mask).astype(pts1_n.dtype)
            enough = jnp.sum(w) >= 8
            E_new = eight_point(pts1_n, pts2_n, weights=w)
            E_new, _, _ = project_to_essential(E_new)
            d2n = sampson_error_sq(E_new, pts1_n, pts2_n)
            d2n = jnp.where(jnp.isfinite(d2n), d2n, thr2)
            loss_new = jnp.sum(jnp.minimum(d2n, thr2)
                               * valid_mask.astype(pts1_n.dtype))
            take = enough & (loss_new <= loss_cur)
            E_out = jnp.where(take, E_new, E_cur)
            return (E_out, jnp.where(take, loss_new, loss_cur)), None

        loss0 = loss_cand[ci]
        (E_best, _), _ = jax.lax.scan(
            lo_step, (E_best, loss0),
            jnp.asarray([4.0, 2.0, 1.4142135, 1.0], pts1_n.dtype))
        d2b = sampson_error_sq(E_best, pts1_n, pts2_n)
        d2b = jnp.where(jnp.isfinite(d2b), d2b, thr2)
        inlier_mask = (d2b < thr2) & valid_mask

    def refit(carry, _):
        E_cur, mask_cur = carry
        w = mask_cur.astype(pts1_n.dtype)
        # Guard: keep previous model if the inlier set collapsed below 8.
        enough = jnp.sum(mask_cur.astype(jnp.int32)) >= 8
        E_new = eight_point(pts1_n, pts2_n, weights=w)
        E_new, _, _ = project_to_essential(E_new)
        d2_new = sampson_error_sq(E_new, pts1_n, pts2_n)
        mask_new = (d2_new < thr2) & valid_mask
        better = jnp.sum(mask_new.astype(jnp.int32)) >= jnp.sum(mask_cur.astype(jnp.int32))
        take = enough & better
        E_out = jnp.where(take, E_new, E_cur)
        mask_out = jnp.where(take, mask_new, mask_cur)
        return (E_out, mask_out), None

    (E_best, inlier_mask), _ = jax.lax.scan(
        refit, (E_best, inlier_mask), None, length=refit_rounds
    )

    num_inliers = jnp.sum(inlier_mask.astype(jnp.int32))

    if degensac:
        # Degeneracy handling, two mechanisms (both fixed-shape blocks):
        # 1. Dominant-plane rescue (geometry/homography.py): planar
        #    scenes admit a 2-parameter family F = [e']x H of wrong-but-
        #    well-counting models; re-estimate via plane-and-parallax
        #    when a homography explains >= 80% of the winner's support
        #    or GRIC prefers H over E.
        # 2. Count-tie ambiguity blend (geometry/ambiguity.py): when the
        #    top hypotheses tie on count but disagree in rotation (a flat
        #    likelihood valley no image-resident criterion separates —
        #    module docstring has the measurements), return the chordal
        #    mean of the tied set instead of an arbitrary endpoint.
        # The blend only runs when the plane rescue did not fire: a
        # successful rescue already re-estimated from off-plane evidence.
        from .ambiguity import ambiguity_blend
        from .homography import degensac_rescue

        E_best, inlier_mask, num_inliers, used_pp, _ = degensac_rescue(
            jax.random.fold_in(key, 7), E_best, inlier_mask, num_inliers,
            pts1_n, pts2_n, valid_mask, threshold_n)
        E_bl, mask_bl, n_bl, _ = ambiguity_blend(
            E_h, score, counts, inliers_h, pts1_n, pts2_n, valid_mask,
            threshold_n, E_best, inlier_mask, num_inliers)
        E_best = jnp.where(used_pp, E_best, E_bl)
        inlier_mask = jnp.where(used_pp, inlier_mask, mask_bl)
        num_inliers = jnp.where(used_pp, num_inliers, n_bl)

    # Gate on the solver's minimal sample size: the reference succeeds with
    # as few as 5 matches on the 5pt path (src/core/pose_estimator.py:514;
    # cv2.findEssentialMat's 5pt solver works at N=5). The weighted-8pt
    # refit above guards itself with its own >=8 check, so a 5-7 match pair
    # simply keeps the minimal model.
    min_valid = 5 if solver == "5pt" else 8
    ok = (num_valid >= min_valid) & (num_inliers >= 5)
    return {
        "E": E_best,
        "inlier_mask": inlier_mask,
        "num_inliers": num_inliers,
        "ok": ok,
    }
