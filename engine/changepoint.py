"""Bayesian online change-point detection per series (round 6).

BOCPD (Adams & MacKay 2007) maintains, one observation at a time, the
full posterior over the RUN LENGTH since the last change point — the
online multi-change-point complement to the engine's retrospective
single-change Pettitt test and to CUSUM's drift-alarm view: Pettitt says
"there was one change, here"; CUSUM says "we have drifted past h"; BOCPD
says at every step "probability the regime just changed, and how old the
current regime is".

Model: unknown-mean unknown-variance Gaussian segments with the
conjugate Normal-Inverse-Gamma prior (mu0, kappa0, alpha0, beta0), so
the predictive is Student-t with closed-form sequential updates —
nothing is fitted, every float op is deterministic. Constant hazard
H = 1/HAZARD_LAM. The run-length posterior is truncated at R_MAX states
(overflow mass collapses into the oldest state), bounding per-series
state at O(R_MAX) regardless of series length.

Change-term semantics: the r_t = 0 hypothesis scores x_t under the NEW
segment's PRIOR predictive (the exact-filtering semantics of Fearnhead
& Liu 2007, where a segment starting at t contains x_t) rather than
under the outgoing run as in Adams & MacKay's message order — under a
constant hazard the latter makes P(r_t = 0 | x_1:t) identically h
(every term shares the same predictive sum), so the emitted p_change
would carry no information; with the prior-predictive term it spikes
exactly when no existing run explains x_t but a fresh segment does.
The r = 0 state therefore ENTERS the recursion already updated with
x_t, and every grown state absorbs x_t as usual.

alpha sits on the half-integer lattice alpha0 + r/2, so the Student-t
normalizer's lgamma terms come from one precomputed table — no scipy
dependency.

Input is standardized in-kernel (z = (cents - mean)/population sd) so
the unit prior scale is meaningful for any series; constant series
(sd = 0) yield NULL outputs upstream.

Scale shape: one applyInPandas kernel per series on the user exchange
(the shesd/lttb family); per-step work and memory are O(R_MAX).
Rows-only for the driver gate (a sequential posterior recursion has no
SQL twin); pinned in pytest against an independent UNtruncated
reference recursion plus a physics pin (an injected level shift must
spike p_change at the shift).
"""

from __future__ import annotations

import math

import numpy as np

HAZARD_LAM = 250.0  # expected run length under the hazard
R_MAX = 64  # run-length posterior truncation (states kept)
MU0, KAPPA0, ALPHA0, BETA0 = 0.0, 1.0, 1.0, 1.0


def _lgamma_table(n: int) -> np.ndarray:
    # lgamma(ALPHA0 + k/2): the truncated posterior's OLDEST state keeps
    # absorbing observations, so its alpha grows with the series length
    # (not with rmax) — size the lattice by n
    return np.array(
        [math.lgamma(ALPHA0 + k / 2.0) for k in range(n + 6)]
    )


def bocpd(
    x: np.ndarray,
    hazard_lam: float = HAZARD_LAM,
    rmax: int = R_MAX,
) -> tuple[np.ndarray, np.ndarray]:
    """Run-length posterior filter over one series.

    Returns (map_run, p_change): per step, the MAP run length (ties ->
    the SMALLER run length, deterministic) and the posterior probability
    that a change point occurred at this step (mass of r_t = 0).
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    h = 1.0 / float(hazard_lam)
    lgt = _lgamma_table(n)

    # state arrays over current run-length hypotheses (index = r);
    # empty before the first observation — x[0] necessarily starts a
    # run, so p_change[0] normalizes to 1
    mu = np.empty(0)
    kappa = np.empty(0)
    alpha = np.empty(0)
    beta = np.empty(0)
    logp = np.empty(0)  # log posterior over run lengths

    map_run = np.empty(n, dtype=np.int64)
    p_change = np.empty(n, dtype=np.float64)

    for t in range(n):
        # Student-t predictive log-density of x[t] under each state:
        # ln t_nu(x; mu, s2) with nu = 2*alpha, s2 = beta(kappa+1)/
        # (alpha*kappa); lgamma(alpha+1/2)-lgamma(alpha) from the table
        # (alpha sits on the half-integer lattice ALPHA0 + k/2)
        k_idx = np.rint((alpha - ALPHA0) * 2).astype(np.int64)
        scale2 = beta * (kappa + 1.0) / (alpha * kappa)
        zz = (x[t] - mu) ** 2 / scale2
        nu = 2.0 * alpha
        lpred = (
            lgt[k_idx + 1]
            - lgt[k_idx]
            - 0.5 * np.log(nu * math.pi * scale2)
            - (alpha + 0.5) * np.log1p(zz / nu)
        )

        # prior predictive of x[t] for the r_t = 0 (fresh segment) term
        s2p = BETA0 * (KAPPA0 + 1.0) / (ALPHA0 * KAPPA0)
        nup = 2.0 * ALPHA0
        lprior = (
            lgt[1]
            - lgt[0]
            - 0.5 * math.log(nup * math.pi * s2p)
            - (ALPHA0 + 0.5) * math.log1p(((x[t] - MU0) ** 2 / s2p) / nup)
        )

        grow_log = logp + lpred + math.log(1.0 - h)
        change_log = math.log(h) + lprior  # sum_r p[r] = 1
        joint = np.concatenate([[change_log], grow_log])
        m = joint.max()
        w = np.exp(joint - m)
        post = w / w.sum()

        # truncate: collapse overflow mass into the oldest kept state
        if len(post) > rmax + 1:
            post[rmax] += post[rmax + 1 :].sum()
            post = post[: rmax + 1]

        p_change[t] = post[0]
        map_run[t] = int(np.argmax(post))  # argmax takes the first max

        # every state absorbs x[t]: r=0 starts from the prior, r>=1
        # continue the grown runs
        mu_all = np.concatenate([[MU0], mu])
        kappa_all = np.concatenate([[KAPPA0], kappa])
        alpha_all = np.concatenate([[ALPHA0], alpha])
        beta_all = np.concatenate([[BETA0], beta])
        mu_new = (kappa_all * mu_all + x[t]) / (kappa_all + 1.0)
        beta_new = beta_all + kappa_all * (x[t] - mu_all) ** 2 / (
            2.0 * (kappa_all + 1.0)
        )
        kappa_new = kappa_all + 1.0
        alpha_new = alpha_all + 0.5
        if len(post) < len(mu_new):  # truncation happened
            # post merged the tail into index rmax; keep the OLDEST
            # state's parameters (the longest run) for that slot
            mu_new = np.concatenate([mu_new[:rmax], mu_new[-1:]])
            kappa_new = np.concatenate([kappa_new[:rmax], kappa_new[-1:]])
            alpha_new = np.concatenate([alpha_new[:rmax], alpha_new[-1:]])
            beta_new = np.concatenate([beta_new[:rmax], beta_new[-1:]])
        mu, kappa, alpha, beta = mu_new, kappa_new, alpha_new, beta_new
        with np.errstate(divide="ignore"):
            logp = np.log(post)

    return map_run, p_change


def reference_bocpd(x, hazard_lam: float = HAZARD_LAM):
    """Independent UNtruncated reference recursion (plain Python loops,
    linear-domain probabilities) used ONLY by tests to pin the kernel
    while the truncation is inactive (n <= R_MAX)."""
    x = [float(v) for v in x]
    h = 1.0 / float(hazard_lam)

    def lpred(xt, m, k, a, b):
        nu = 2.0 * a
        s2 = b * (k + 1.0) / (a * k)
        z = (xt - m) ** 2 / s2
        return (
            math.lgamma(a + 0.5)
            - math.lgamma(a)
            - 0.5 * math.log(nu * math.pi * s2)
            - (a + 0.5) * math.log1p(z / nu)
        )

    states = []  # grown-run states; r=0 is re-created from the prior
    probs = []
    map_run, p_change = [], []
    for xt in x:
        change = h * math.exp(lpred(xt, MU0, KAPPA0, ALPHA0, BETA0))
        grow = [
            p * math.exp(lpred(xt, m, k, a, b)) * (1.0 - h)
            for p, (m, k, a, b) in zip(probs, states)
        ]
        new = [change] + grow
        tot = sum(new)
        post = [v / tot for v in new]
        p_change.append(post[0])
        best = max(range(len(post)), key=lambda i: (post[i], -i))
        map_run.append(best)
        upd = []
        for (m, k, a, b) in [(MU0, KAPPA0, ALPHA0, BETA0)] + states:
            upd.append(
                (
                    (k * m + xt) / (k + 1.0),
                    k + 1.0,
                    a + 0.5,
                    b + k * (xt - m) ** 2 / (2.0 * (k + 1.0)),
                )
            )
        states, probs = upd, post
    return map_run, p_change
