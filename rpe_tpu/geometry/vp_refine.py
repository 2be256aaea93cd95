"""Vanishing-point (Manhattan-world) rotation refinement.

Re-implementation of the reference's VP subsystem (src/core/pose_estimator.py
:159-481, per VP-SLAM arXiv:2210.12756): line segments -> pairwise VP voting
into a 90x360 lat/lon accumulator on the Gaussian half-sphere with weight
|l1||l2||sin 2theta| -> VP1 = argmax bin, VP2 = best score on the great
circle orthogonal to VP1 (360 x 1-degree scan), VP3 = re-orthogonalized
cross product -> Levenberg-Marquardt on SO(3) minimizing
sum_k arccos(delta_k . (R d_k)) with the analytic Jacobian
-(1/sqrt(1-s^2)) (delta x (R d)).

Line segments come from the TPU LSD equivalent (ops/lsd.py). The voting is
vectorized (the reference's pure-Python pair loop, pose_estimator.py:311-332,
becomes one scatter-add); the LM loop is 3x3 numpy (12 iterations, host —
this path is gated and rare, CLAUDE-doc'd as rarely firing in the reference).

Gating semantics preserved exactly: reliability requires acc_max >= acc_min
AND vp2_score >= vp2_min on BOTH frames; refinement is accepted only when
the cost improves by more than cost_improve_eps, else the geometric R_rel
stands (pose_estimator.py:545-567).
"""

from __future__ import annotations

import numpy as np

from ..config import VpConfig
from ..ops.lsd import detect_line_segments

_N_LAT, _N_LON = 90, 360


def _so3_exp_np(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def manhattan_dirs_for_frames(frames, K, cfg: VpConfig):
    """Per-frame Manhattan directions for a whole frame stack at once.

    frames: (F, H, W) float; returns a list of (Delta | None, ok, dbg) in
    frame order. The reference computes VP statistics twice per *pair*
    (both frames, src/core/pose_estimator.py:541-542) even though
    consecutive pairs share a frame; here each frame is labeled once, all
    F label-propagation passes run as ONE device dispatch (lax.map), and
    the voting runs vectorized per frame. Numerics are identical to
    estimate_manhattan_dirs.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.lsd import _label_regions, segments_from_labels

    frames = np.asarray(frames, dtype=np.float32)
    labels, _, mag = jax.lax.map(_label_regions, jnp.asarray(frames))
    labels = np.asarray(labels)
    mag = np.asarray(mag)
    out = []
    for f in range(frames.shape[0]):
        lines = segments_from_labels(labels[f], mag[f])
        out.append(_dirs_from_lines(lines, K, cfg, rng_seed=f))
    return out


def manhattan_dirs_for_frames_device(frames, K, cfg: VpConfig,
                                     max_segments: int = 256):
    """Device twin of `manhattan_dirs_for_frames`: labeling, segment
    reduction AND voting for a whole frame stack in ONE dispatch
    (lax.map over frames), host work reduced to unpacking scalars.

    Same list-of-(Delta | None, ok, dbg) contract. Opt-in from the batch
    pipeline via RPE_VP_DEVICE=1 (gate statistics deviate from the host
    twin only in the sampling regime — see _dirs_from_lines_device)."""
    import jax
    import jax.numpy as jnp

    from ..ops.lsd import detect_line_segments_device

    frames = np.asarray(frames, dtype=np.float32)
    Kj = jnp.asarray(K, jnp.float32)

    def one(args):
        im, seed = args
        segs, valid = detect_line_segments_device(
            im, max_segments=max_segments)
        D, ok, st = _dirs_from_lines_device(segs, valid, Kj, cfg,
                                            rng_seed=seed)
        return D, ok, st["acc_max"], st["vp2_score"], st["num_lines"]

    seeds = jnp.arange(frames.shape[0], dtype=jnp.uint32)  # host twin
    # seeds each frame with its index (manhattan_dirs_for_frames)
    D, ok, acc, vp2, nl = jax.lax.map(one, (jnp.asarray(frames), seeds))
    D, ok, acc, vp2, nl = (np.asarray(a) for a in (D, ok, acc, vp2, nl))
    out = []
    for f in range(frames.shape[0]):
        dbg = {"num_lines": int(nl[f]), "acc_max": float(acc[f]),
               "vp2_score": float(vp2[f]),
               "lines_used": int(min(int(nl[f]), cfg.max_lines))}
        okf = bool(ok[f])
        out.append((np.asarray(D[f], np.float64) if okf else None, okf, dbg))
    return out


def estimate_manhattan_dirs(gray, K, cfg: VpConfig, rng_seed: int = 0):
    """Extract 3 orthogonal Manhattan directions (camera frame).

    Returns (Delta (3,3) columns = directions | None, ok, debug dict) with
    the same contract as the reference `_estimate_manhattan_dirs`
    (pose_estimator.py:255-386).
    """
    lines = detect_line_segments(gray)
    return _dirs_from_lines(lines, K, cfg, rng_seed)


def _dirs_from_lines(lines, K, cfg: VpConfig, rng_seed: int = 0):
    """Voting + VP extraction from (N, 4) segments (host entry point)."""
    dbg = {"num_lines": int(lines.shape[0])}
    if lines.shape[0] < 10:
        return None, False, dbg

    dx = lines[:, 2] - lines[:, 0]
    dy = lines[:, 3] - lines[:, 1]
    lens_all = np.hypot(dx, dy) + 1e-9
    order = np.argsort(-lens_all)[: min(cfg.max_lines, len(lines))]
    lines = lines[order]
    lens = lens_all[order]
    angles = np.arctan2(dy[order], dx[order])

    # homogeneous lines, normalized by the norm of the (a, b) part
    p1 = np.concatenate([lines[:, 0:2], np.ones((len(lines), 1))], axis=1)
    p2 = np.concatenate([lines[:, 2:4], np.ones((len(lines), 1))], axis=1)
    hl = np.cross(p1, p2)
    hl = hl / (np.linalg.norm(hl[:, :2], axis=1, keepdims=True) + 1e-12)

    m = len(lines)
    total_pairs = m * (m - 1) // 2
    if total_pairs <= cfg.max_pairs:
        ii, jj = np.triu_indices(m, k=1)
    else:
        rng = np.random.default_rng(rng_seed)
        a = rng.integers(0, m, size=cfg.max_pairs)
        b = rng.integers(0, m, size=cfg.max_pairs)
        keep = a != b
        ii = np.minimum(a[keep], b[keep])
        jj = np.maximum(a[keep], b[keep])

    # vectorized VP voting (replaces the Python loop at :311-332)
    vp = np.cross(hl[ii], hl[jj])
    finite = np.abs(vp[:, 2]) >= 1e-9
    vp, ii, jj = vp[finite], ii[finite], jj[finite]
    vp_xy = vp[:, :2] / vp[:, 2:3]

    theta = np.abs(angles[ii] - angles[jj])
    theta = np.abs((theta + np.pi) % (2 * np.pi) - np.pi)
    w = lens[ii] * lens[jj] * np.abs(np.sin(2.0 * theta))
    pos = w > 0
    vp_xy, w = vp_xy[pos], w[pos]

    Kinv = np.linalg.inv(K)
    v = np.concatenate([vp_xy, np.ones((len(vp_xy), 1))], axis=1) @ Kinv.T
    v = v / (np.linalg.norm(v, axis=1, keepdims=True) + 1e-12)
    v = np.where(v[:, 2:3] < 0, -v, v)  # half-sphere z > 0

    lat = np.rad2deg(np.arctan2(np.hypot(v[:, 0], v[:, 1]), v[:, 2]))
    lon = (np.rad2deg(np.arctan2(v[:, 1], v[:, 0])) + 360.0) % 360.0
    lat_i = np.clip(lat, 0, _N_LAT - 1).astype(np.int64)
    lon_i = np.clip(lon, 0, _N_LON - 1).astype(np.int64)

    acc = np.zeros((_N_LAT, _N_LON))
    np.add.at(acc, (lat_i, lon_i), w)

    acc_max = float(acc.max())
    dbg["acc_max"] = acc_max
    dbg["lines_used"] = int(m)
    if acc_max <= 0:
        return None, False, dbg

    lat1, lon1 = np.unravel_index(np.argmax(acc), acc.shape)
    lat1r, lon1r = np.deg2rad(lat1 + 0.5), np.deg2rad(lon1 + 0.5)
    v1 = np.array([np.sin(lat1r) * np.cos(lon1r),
                   np.sin(lat1r) * np.sin(lon1r),
                   np.cos(lat1r)])
    v1 /= np.linalg.norm(v1) + 1e-12

    # VP2: best accumulator score on the great circle orthogonal to v1
    tmp = np.array([1.0, 0.0, 0.0])
    if abs(tmp @ v1) > 0.9:
        tmp = np.array([0.0, 1.0, 0.0])
    a = np.cross(v1, tmp)
    a /= np.linalg.norm(a) + 1e-12
    b = np.cross(v1, a)
    b /= np.linalg.norm(b) + 1e-12

    degs = np.deg2rad(np.arange(360.0))
    cands = np.cos(degs)[:, None] * a + np.sin(degs)[:, None] * b  # (360, 3)
    cands /= np.linalg.norm(cands, axis=1, keepdims=True) + 1e-12
    ch = np.where(cands[:, 2:3] < 0, -cands, cands)
    clat = np.rad2deg(np.arctan2(np.hypot(ch[:, 0], ch[:, 1]), ch[:, 2]))
    clon = (np.rad2deg(np.arctan2(ch[:, 1], ch[:, 0])) + 360.0) % 360.0
    scores = acc[np.clip(clat, 0, _N_LAT - 1).astype(int),
                 np.clip(clon, 0, _N_LON - 1).astype(int)]
    best = int(np.argmax(scores))
    best_score = float(scores[best])
    v2 = cands[best]
    dbg["vp2_score"] = best_score
    if best_score <= 0:
        return None, False, dbg

    v3 = np.cross(v1, v2)
    v3 /= np.linalg.norm(v3) + 1e-12
    v2 = np.cross(v3, v1)
    v2 /= np.linalg.norm(v2) + 1e-12
    Delta = np.stack([v1, v2, v3], axis=1)
    return Delta, True, dbg


def vp_cost(R_iw, Delta_cam, D_world):
    """sum_k arccos(delta_k . (R d_k)) — reference pose_estimator.py:403-425."""
    u = R_iw @ D_world  # columns
    s = np.clip(np.sum(Delta_cam * u, axis=0), -1.0, 1.0)
    return float(np.sum(np.arccos(s)))


def optimize_rotation_from_vps(R_init, Delta_cam, D_world, cfg: VpConfig,
                               jacobian_sign: float = +1.0):
    """LM on SO(3) (reference pose_estimator.py:427-481).

    DOCUMENTED DEVIATION: the reference computes the Jacobian as
    J = -(1/sqrt(1-s^2)) (delta x (Rd)) (pose_estimator.py:456-459), but the
    true derivative of arccos(delta . (exp(w) R d)) at w=0 is
    +(1/sqrt(1-s^2)) (delta x (Rd)): with the left-multiplied update
    u' = exp(dw) u, du = dw x u, and d(arccos s) = -(1/sqrt(1-s^2)) *
    delta.(dw x u) = -(1/sqrt(1-s^2)) dw.(u x delta) = +(1/sqrt(1-s^2))
    dw.(delta x u). The reference's sign makes its LM *ascend* the cost, so
    its acceptance gate (cost must improve, :565) silently rejects nearly
    every refinement — the subsystem is dead code there. We default to the
    correct sign (verified: converges to 0 deg error on consistent synthetic
    problems; the reference's diverges). Pass jacobian_sign=-1.0 to
    reproduce the reference's behavior bit-for-bit (used by the parity
    test).
    """
    R = R_init.copy()
    for _ in range(cfg.iters):
        u = R @ D_world                                  # (3, 3) columns u_k
        s = np.clip(np.sum(Delta_cam * u, axis=0), -1.0, 1.0)
        r = np.arccos(s).reshape(3, 1)
        denom = np.sqrt(np.maximum(1e-12, 1.0 - s * s))  # (3,)
        cross = np.cross(Delta_cam.T, u.T)               # (3, 3) rows
        J = jacobian_sign * (cross / denom[:, None])
        H = J.T @ J + cfg.lm_lambda * np.eye(3)
        g = J.T @ r
        try:
            dw = -np.linalg.solve(H, g).reshape(3)
        except np.linalg.LinAlgError:
            break
        R = _so3_exp_np(dw) @ R
        if np.linalg.norm(dw) < 1e-7:
            break
    return R


def optimize_rotation_from_vps_jit(R_init, Delta_cam, D_world,
                                   iters: int = 12,
                                   lm_lambda: float = 1e-2,
                                   jacobian_sign: float = +1.0):
    """Device-resident LM on SO(3) — jit-compatible twin of
    `optimize_rotation_from_vps` (SURVEY.md §7 step 8 asked for a
    jit-compatible override; the numpy twin remains the default because
    the VP gate fires rarely and host 3x3 algebra is cheaper than a
    dispatch, but a VP-heavy batched pipeline can vmap/jit this one).

    Same semantics: fixed `iters` Levenberg-Marquardt steps with the
    analytic Jacobian sign fix (see the numpy twin's docstring for the
    reference deviation, pose_estimator.py:456-459); the early-stop at
    ||dw|| < 1e-7 becomes a masked freeze so shapes stay static.
    """
    import jax
    import jax.numpy as jnp

    from .rotations import so3_exp

    R0 = jnp.asarray(R_init, jnp.float32)
    Dc = jnp.asarray(Delta_cam, jnp.float32)
    Dw = jnp.asarray(D_world, jnp.float32)

    _hi = jax.lax.Precision.HIGHEST   # 3x3 algebra: TPU default f32
    # matmul is a single bf16 pass — quantized LM steps random-walk the
    # iterate and poison the cost-improvement acceptance test

    def step(carry, _):
        R, frozen = carry
        u = jnp.matmul(R, Dw, precision=_hi)              # (3, 3) columns
        s = jnp.clip(jnp.sum(Dc * u, axis=0), -1.0, 1.0)
        cross = jnp.cross(Dc.T, u.T)                      # (3, 3) rows
        # arccos(s) and sqrt(1-s^2) cancel catastrophically in f32 near
        # convergence (the 1e-7 stop then never fires and the iterate
        # random-walks ~0.1 deg); arctan2(||delta x u||, s) is the same
        # angle, well-conditioned at 0, and ||cross|| IS sin(angle).
        sin_ang = jnp.linalg.norm(cross, axis=1)
        r = jnp.arctan2(sin_ang, s)[:, None]              # (3, 1)
        denom = jnp.maximum(sin_ang, 1e-12)
        J = jacobian_sign * (cross / denom[:, None])
        H = (jnp.matmul(J.T, J, precision=_hi)
             + lm_lambda * jnp.eye(3, dtype=R.dtype))
        g = jnp.matmul(J.T, r, precision=_hi)
        dw = -jax.scipy.linalg.solve(H, g, assume_a="pos")[:, 0]
        dw = jnp.where(jnp.isfinite(dw), dw, 0.0)
        converged = jnp.linalg.norm(dw) < 1e-7
        R_next = jnp.where(frozen, R,
                           jnp.matmul(so3_exp(dw), R, precision=_hi))
        return (R_next, frozen | converged), None

    (R, _), _ = jax.lax.scan(step, (R0, jnp.asarray(False)), None,
                             length=iters)
    return R


def _dirs_from_lines_device(segs, seg_valid, K, cfg: VpConfig,
                            rng_seed=0):
    """Device-resident twin of `_dirs_from_lines` (jittable).

    segs: (M, 4) f32, seg_valid: (M,) bool (from
    ops.lsd.detect_line_segments_device). Returns (Delta (3,3) f32, ok
    bool scalar, stats dict of jnp scalars {acc_max, vp2_score,
    num_lines}).

    Sampling regime (round 5, verdict #6): when the pair count exceeds
    cfg.max_pairs this now reproduces the reference's WITH-REPLACEMENT
    pair sampling (pose_estimator.py:311-318) with a counter-based
    device PRNG keyed on `rng_seed` (a traced scalar — the frame index,
    matching the host twin's np.random.default_rng(rng_seed)). The
    max-bin statistics acc_max / vp2_score are extreme-value statistics
    of the SAMPLED vote, so the reference-calibrated gates (acc_min,
    vp2_min) see the same distribution by construction — the previous
    all-pairs + expectation-rescale deviation undercounted the max bin
    3-100x on heavy-tailed line-length weights (PARITY.md round-4
    measurement) and is gone. Draws differ from numpy's PRNG, so
    per-frame statistics agree in distribution, not bit-for-bit; the
    VP_DEVICE validation section gates on per-frame gate DECISIONS.
    Below max_pairs the exhaustive triu enumeration is identical to the
    host twin (rtol 2e-4, tested).
    """
    import jax
    import jax.numpy as jnp

    segs = jnp.asarray(segs, jnp.float32)
    seg_valid = jnp.asarray(seg_valid)
    Kj = jnp.asarray(K, jnp.float32)

    num_lines = jnp.sum(seg_valid.astype(jnp.int32))

    dx = segs[:, 2] - segs[:, 0]
    dy = segs[:, 3] - segs[:, 1]
    lens_all = jnp.where(seg_valid, jnp.hypot(dx, dy) + 1e-9, 0.0)

    L = min(int(cfg.max_lines), int(segs.shape[0]))
    lens, order = jax.lax.top_k(lens_all, L)
    lines = segs[order]
    lvalid = lens > 0.0
    angles = jnp.arctan2(dy[order], dx[order])

    ones = jnp.ones((L, 1), jnp.float32)
    p1 = jnp.concatenate([lines[:, 0:2], ones], axis=1)
    p2 = jnp.concatenate([lines[:, 2:4], ones], axis=1)
    hl = jnp.cross(p1, p2)
    hl = hl / (jnp.linalg.norm(hl[:, :2], axis=1, keepdims=True) + 1e-12)

    Kinv = jnp.linalg.inv(Kj)

    def vote(ii, jj, pair_ok):
        """(lat_i, lon_i, wt) for index vectors ii/jj (host-twin math)."""
        vp = jnp.cross(hl[ii], hl[jj])
        finite = jnp.abs(vp[:, 2]) >= 1e-9
        vp_xy = vp[:, :2] / jnp.where(finite[:, None], vp[:, 2:3], 1.0)
        theta = jnp.abs(angles[ii] - angles[jj])
        theta = jnp.abs((theta + jnp.pi) % (2 * jnp.pi) - jnp.pi)
        wt = lens[ii] * lens[jj] * jnp.abs(jnp.sin(2.0 * theta))
        wt = jnp.where(pair_ok & finite, wt, 0.0)
        v = jnp.concatenate(
            [vp_xy, jnp.ones((vp_xy.shape[0], 1), jnp.float32)],
            axis=1) @ Kinv.T
        v = v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-12)
        v = jnp.where(v[:, 2:3] < 0, -v, v)
        lat = jnp.rad2deg(jnp.arctan2(jnp.hypot(v[:, 0], v[:, 1]), v[:, 2]))
        lon = (jnp.rad2deg(jnp.arctan2(v[:, 1], v[:, 0])) + 360.0) % 360.0
        lat_i = jnp.clip(lat, 0, _N_LAT - 1).astype(jnp.int32)
        lon_i = jnp.clip(lon, 0, _N_LON - 1).astype(jnp.int32)
        return lat_i, lon_i, wt

    # exhaustive regime (total pairs <= max_pairs): all triu pairs
    ii_a, jj_a = np.triu_indices(L, k=1)
    ii_a = jnp.asarray(ii_a)
    jj_a = jnp.asarray(jj_a)
    la, lo, wa = vote(ii_a, jj_a, lvalid[ii_a] & lvalid[jj_a])

    # sampled regime: max_pairs with-replacement draws over the live
    # lines (i == j draws dropped — reference :311-318 keeps the rest,
    # duplicates included: they legitimately inflate the max bin)
    mv_i = jnp.clip(num_lines, 2, L)          # live lines after top-L cut
    key = jax.random.PRNGKey(jnp.asarray(rng_seed, jnp.uint32))
    ka, kb = jax.random.split(key)
    P = int(cfg.max_pairs)
    a = jax.random.randint(ka, (P,), 0, mv_i)
    b = jax.random.randint(kb, (P,), 0, mv_i)
    ls, os_, ws = vote(a, b, (a != b) & lvalid[a] & lvalid[b])

    tv = mv_i * (mv_i - 1) // 2
    use_sampled = tv > P
    wa = jnp.where(use_sampled, 0.0, wa)
    ws = jnp.where(use_sampled, ws, 0.0)
    acc = jnp.zeros((_N_LAT, _N_LON), jnp.float32).at[la, lo].add(wa)
    acc = acc.at[ls, os_].add(ws)
    acc_max = jnp.max(acc)

    amax = jnp.argmax(acc)
    lat1 = (amax // _N_LON).astype(jnp.float32)
    lon1 = (amax % _N_LON).astype(jnp.float32)
    lat1r = jnp.deg2rad(lat1 + 0.5)
    lon1r = jnp.deg2rad(lon1 + 0.5)
    v1 = jnp.stack([jnp.sin(lat1r) * jnp.cos(lon1r),
                    jnp.sin(lat1r) * jnp.sin(lon1r),
                    jnp.cos(lat1r)])
    v1 = v1 / (jnp.linalg.norm(v1) + 1e-12)

    # VP2: best accumulator score on the great circle orthogonal to v1
    ex = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    ey = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    tmp = jnp.where(jnp.abs(ex @ v1) > 0.9, ey, ex)
    a = jnp.cross(v1, tmp)
    a = a / (jnp.linalg.norm(a) + 1e-12)
    b = jnp.cross(v1, a)
    b = b / (jnp.linalg.norm(b) + 1e-12)

    degs = jnp.deg2rad(jnp.arange(360.0, dtype=jnp.float32))
    cands = jnp.cos(degs)[:, None] * a + jnp.sin(degs)[:, None] * b
    cands = cands / (jnp.linalg.norm(cands, axis=1, keepdims=True) + 1e-12)
    ch = jnp.where(cands[:, 2:3] < 0, -cands, cands)
    clat = jnp.rad2deg(jnp.arctan2(jnp.hypot(ch[:, 0], ch[:, 1]), ch[:, 2]))
    clon = (jnp.rad2deg(jnp.arctan2(ch[:, 1], ch[:, 0])) + 360.0) % 360.0
    scores = acc[jnp.clip(clat, 0, _N_LAT - 1).astype(jnp.int32),
                 jnp.clip(clon, 0, _N_LON - 1).astype(jnp.int32)]
    best = jnp.argmax(scores)
    vp2_score = scores[best]
    v2 = cands[best]

    v3 = jnp.cross(v1, v2)
    v3 = v3 / (jnp.linalg.norm(v3) + 1e-12)
    v2 = jnp.cross(v3, v1)
    v2 = v2 / (jnp.linalg.norm(v2) + 1e-12)
    Delta = jnp.stack([v1, v2, v3], axis=1)

    ok = (num_lines >= 10) & (acc_max > 0.0) & (vp2_score > 0.0)
    stats = {"acc_max": acc_max, "vp2_score": vp2_score,
             "num_lines": num_lines}
    return Delta, ok, stats


def estimate_manhattan_dirs_device(gray, K, cfg: VpConfig,
                                   max_segments: int = 256,
                                   rng_seed=0):
    """Jittable Manhattan-direction extraction (device twin of
    `estimate_manhattan_dirs`): LSD labeling -> segment reduction ->
    voting (sampled above cfg.max_pairs, seeded by `rng_seed` like the
    host twin), one XLA program."""
    from ..ops.lsd import detect_line_segments_device

    segs, valid = detect_line_segments_device(gray,
                                              max_segments=max_segments)
    return _dirs_from_lines_device(segs, valid, K, cfg, rng_seed=rng_seed)


def vp_cost_jit(R_iw, Delta_cam, D_world):
    """jnp twin of `vp_cost` (arctan2 form: same angle, well-conditioned
    near 0 — see optimize_rotation_from_vps_jit)."""
    import jax
    import jax.numpy as jnp

    u = jnp.matmul(R_iw, D_world, precision=jax.lax.Precision.HIGHEST)
    s = jnp.clip(jnp.sum(Delta_cam * u, axis=0), -1.0, 1.0)
    sin_ang = jnp.linalg.norm(jnp.cross(Delta_cam.T, u.T), axis=1)
    return jnp.sum(jnp.arctan2(sin_ang, s))


def refine_rotation_with_vps_device(img1, img2, R_prev, R_rel, K,
                                    cfg: VpConfig,
                                    max_segments: int = 256):
    """Fully device-resident gated VP refinement (jittable end to end).

    Same acceptance semantics as `refine_rotation_with_vps` (reference
    pose_estimator.py:536-567): both frames must pass the reliability
    gates AND the optimized cost must improve by more than
    cost_improve_eps, else R_rel passes through unchanged. Data-dependent
    accept/reject is a jnp.where select, so the whole thing traces into
    one program — usable inside vmapped/sharded batch pipelines (the host
    twin would serialize every pair on VP-heavy datasets).

    Returns (R_rel_out (3,3), used (bool scalar), stats dict of jnp
    scalars).
    """
    import jax
    import jax.numpy as jnp

    _hi = jax.lax.Precision.HIGHEST  # 3x3 rotation algebra (bf16 breaks
    # orthonormality at 1e-3 — CLAUDE.md geometry precision rule)
    R_prev = jnp.asarray(R_prev, jnp.float32)
    R_rel = jnp.asarray(R_rel, jnp.float32)
    R_new_init = jnp.matmul(R_prev, R_rel, precision=_hi)

    Delta_prev, ok1, st1 = estimate_manhattan_dirs_device(
        img1, K, cfg, max_segments=max_segments, rng_seed=0)
    Delta_new, ok2, st2 = estimate_manhattan_dirs_device(
        img2, K, cfg, max_segments=max_segments, rng_seed=1)

    good1 = ok1 & (st1["acc_max"] >= cfg.acc_min) \
        & (st1["vp2_score"] >= cfg.vp2_min)
    good2 = ok2 & (st2["acc_max"] >= cfg.acc_min) \
        & (st2["vp2_score"] >= cfg.vp2_min)

    D_world = jnp.matmul(R_prev.T, Delta_prev, precision=_hi)
    cost_init = vp_cost_jit(R_new_init, Delta_new, D_world)
    R_opt = optimize_rotation_from_vps_jit(R_new_init, Delta_new, D_world,
                                           iters=cfg.iters,
                                           lm_lambda=cfg.lm_lambda)
    cost_opt = vp_cost_jit(R_opt, Delta_new, D_world)

    used = good1 & good2 & (cost_opt < cost_init - cfg.cost_improve_eps)
    R_out = jnp.where(used, jnp.matmul(R_prev.T, R_opt, precision=_hi), R_rel)
    stats = {"prev_acc_max": st1["acc_max"], "new_acc_max": st2["acc_max"],
             "prev_vp2": st1["vp2_score"], "new_vp2": st2["vp2_score"],
             "cost_init": cost_init, "cost_opt": cost_opt}
    return R_out, used, stats


def refine_rotation_with_vps(img1, img2, R_prev, R_rel, K, cfg: VpConfig):
    """Full gated refinement (reference pose_estimator.py:536-567).

    Returns (R_rel_out, used, debug). R_rel is returned unchanged unless both
    frames pass the reliability gates AND the optimized cost improves by more
    than cost_improve_eps.
    """
    R_new_init = R_prev @ R_rel
    Delta_prev, ok1, dbg1 = estimate_manhattan_dirs(img1, K, cfg, rng_seed=0)
    Delta_new, ok2, dbg2 = estimate_manhattan_dirs(img2, K, cfg, rng_seed=1)

    dbg = {"prev_frame": dbg1, "new_frame": dbg2,
           "vp_extracted": ok1 and ok2}
    good1 = ok1 and dbg1.get("acc_max", 0.0) >= cfg.acc_min \
        and dbg1.get("vp2_score", 0.0) >= cfg.vp2_min
    good2 = ok2 and dbg2.get("acc_max", 0.0) >= cfg.acc_min \
        and dbg2.get("vp2_score", 0.0) >= cfg.vp2_min
    dbg["reliability"] = {"prev_reliable": good1, "new_reliable": good2}
    if not (good1 and good2):
        return R_rel, False, dbg

    D_world = R_prev.T @ Delta_prev
    cost_init = vp_cost(R_new_init, Delta_new, D_world)
    R_opt = optimize_rotation_from_vps(R_new_init, Delta_new, D_world, cfg)
    cost_opt = vp_cost(R_opt, Delta_new, D_world)
    dbg["optimization"] = {
        "cost_init": cost_init,
        "cost_opt": cost_opt,
        "cost_improved": cost_opt < cost_init - cfg.cost_improve_eps,
    }
    if cost_opt < cost_init - cfg.cost_improve_eps:
        return R_prev.T @ R_opt, True, dbg
    return R_rel, False, dbg
