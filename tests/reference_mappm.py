"""Scalar-loop reference implementation of the mappm algorithm (test oracle).

An independent, slow, loop-based numpy implementation of the PPM vertical
remap semantics (cs_profile / cs_limiters / ppm_profile / ppm_limiters /
mappm), written directly from the algorithm definition, used only to
validate the vectorized JAX implementation in fv3net_tpu/ops/remap.py.
Everything is float64 and per-column.
"""

import numpy as np

_REL = 1e-11


def _near(u, v, scale=1.0):
    """True when the strict comparison u vs v sits within rounding of a
    tie, i.e. a 1-ulp-different implementation may branch differently."""
    return abs(u - v) <= _REL * (abs(u) + abs(v) + scale)


class TieRec:
    """Records cells whose branch decisions are rounding-sensitive.

    Only *discontinuous* branches are recorded: min/max clamps and the
    continuous PPM root constraint need no flags because a hairline
    branch flip yields a hairline output difference there.
    """

    def __init__(self, km):
        self.tie = np.zeros(km, bool)
        self.cell = 0

    def flag(self, cond):
        if cond:
            self.tie[self.cell] = True

    def dilated(self):
        t = self.tie.copy()
        t[1:] |= self.tie[:-1]
        t[:-1] |= self.tie[1:]
        return t


class _NoRec:
    cell = 0

    def flag(self, cond):
        pass


_NOREC = _NoRec()


def cs_limiters_ref(a, al, ar, a6, extm, mode, rec=_NOREC):
    s = abs(a) + abs(al) + abs(ar)
    if mode == 0:
        rec.flag(_near(a, 0.0, s))
        if a <= 0.0:
            return a, a, 0.0
        if abs(ar - al) < -a6:
            fmin = a + 0.25 * (ar - al) ** 2 / a6 + a6 / 12.0
            rec.flag(_near(fmin, 0.0, s))
            if fmin < 0.0:
                rec.flag(_near(a, ar, s) or _near(a, al, s)
                         or _near(ar, al, s))
                if a < ar and a < al:
                    return a, a, 0.0
                elif ar > al:
                    a6n = 3.0 * (al - a)
                    return al, al - a6n, a6n
                else:
                    a6n = 3.0 * (ar - a)
                    return ar - a6n, ar, a6n
        elif not (al == ar and a6 == 0.0):
            # a flat parabola (assigned constants) compares 0 < -0
            # deterministically; only derived near-ties are unstable
            rec.flag(_near(abs(ar - al), -a6, s))
        return al, ar, a6
    if mode == 1:
        rec.flag(_near((a - al) * (a - ar), 0.0, s * s))
        if (a - al) * (a - ar) >= 0.0:
            return a, a, 0.0
    if mode == 2 and extm:
        return a, a, 0.0
    da1 = ar - al
    da2 = da1 ** 2
    a6da = a6 * da1
    if a6da < -da2:
        a6n = 3.0 * (al - a)
        return al, al - a6n, a6n
    elif a6da > da2:
        a6n = 3.0 * (ar - a)
        return ar - a6n, ar, a6n
    return al, ar, a6


def cs_profile_ref(a, dp, iv, kord, qs=0.0, return_ties=False):
    """a, dp: [km]; returns (al, ar, a6) and optionally a tie mask.

    The tie mask flags cells whose limiter branch decisions sit within
    rounding distance of a strict-comparison boundary (e.g. |x0| == x1
    exactly, which clamping produces routinely).  At such cells two
    correct implementations may take different branches due to 1-ulp
    arithmetic differences, so comparisons must exclude them.
    """
    a = np.asarray(a, float)
    dp = np.asarray(dp, float)
    km = len(a)
    q = np.zeros(km + 1)
    gam = np.zeros(km + 1)
    if iv == -2:
        # gam/q indexed as in the algorithm: gam[e] multiplies qe[e+1]
        q[0] = 1.5 * a[0]
        gamv = np.zeros(km)
        gamv[0] = 0.5
        for e in range(1, km - 1):
            grat = dp[e - 1] / dp[e]
            bet = 2.0 + grat + grat - gamv[e - 1]
            q[e] = (3.0 * (a[e - 1] + a[e]) - q[e - 1]) / bet
            gamv[e] = grat / bet
        grat = dp[km - 2] / dp[km - 1]
        q[km - 1] = (
            3.0 * (a[km - 2] + a[km - 1]) - grat * qs - q[km - 2]
        ) / (2.0 + grat + grat - gamv[km - 2])
        q[km] = qs
        for e in range(km - 2, -1, -1):
            q[e] -= gamv[e] * q[e + 1]
    else:
        grat = dp[1] / dp[0]
        bet = grat * (grat + 0.5)
        q[0] = ((grat + grat) * (grat + 1.0) * a[0] + a[1]) / bet
        gam[0] = (1.0 + grat * (grat + 1.5)) / bet
        for e in range(1, km):
            d4 = dp[e - 1] / dp[e]
            bet = 2.0 + d4 + d4 - gam[e - 1]
            q[e] = (3.0 * (a[e - 1] + d4 * a[e]) - q[e - 1]) / bet
            gam[e] = d4 / bet
        a_bot = 1.0 + d4 * (d4 + 1.5)
        q[km] = (
            2.0 * d4 * (d4 + 1.0) * a[km - 1] + a[km - 2] - a_bot * q[km - 1]
        ) / (d4 * (d4 + 0.5) - a_bot * gam[km - 1])
        for e in range(km - 1, -1, -1):
            q[e] -= gam[e] * q[e + 1]

    rec = TieRec(km) if return_ties else _NOREC

    if abs(kord) > 16:
        al = q[:-1].copy()
        ar = q[1:].copy()
        a6 = 3.0 * (2.0 * a - (al + ar))
        if return_ties:
            return al, ar, a6, rec.dilated()
        return al, ar, a6

    # large-scale constraints
    dA = np.zeros(km)
    dA[1:] = a[1:] - a[:-1]
    q[1] = min(max(q[1], min(a[0], a[1])), max(a[0], a[1]))
    for e in range(2, km - 1):
        if return_ties and _near(dA[e - 1] * dA[e + 1], 0.0,
                                 np.abs(a).max() ** 2):
            rec.tie[e - 1] = rec.tie[e] = True
        if dA[e - 1] * dA[e + 1] > 0.0:
            q[e] = min(max(q[e], min(a[e - 1], a[e])), max(a[e - 1], a[e]))
        elif dA[e - 1] > 0.0:
            q[e] = max(q[e], min(a[e - 1], a[e]))
        else:
            q[e] = min(q[e], max(a[e - 1], a[e]))
            if iv == 0:
                q[e] = max(0.0, q[e])
    q[km - 1] = min(
        max(q[km - 1], min(a[km - 2], a[km - 1])), max(a[km - 2], a[km - 1])
    )

    al = q[:-1].copy()
    ar = q[1:].copy()
    a6 = np.zeros(km)

    extm = np.zeros(km, bool)
    ext5 = np.zeros(km, bool)
    ext6 = np.zeros(km, bool)
    scale2 = max(1.0, float(np.abs(a).max())) ** 2
    for c in range(km):
        rec.cell = c
        if c == 0 or c == km - 1:
            extm[c] = (al[c] - a[c]) * (ar[c] - a[c]) > 0.0
            rec.flag(_near((al[c] - a[c]) * (ar[c] - a[c]), 0.0, scale2))
        else:
            extm[c] = dA[c] * dA[c + 1] < 0.0
            rec.flag(_near(dA[c] * dA[c + 1], 0.0, scale2))
        x0 = 2.0 * a[c] - (al[c] + ar[c])
        x1 = abs(al[c] - ar[c])
        a6[c] = 3.0 * x0
        ext5[c] = abs(x0) > x1
        ext6[c] = abs(a6[c]) > x1
        if abs(kord) > 9:
            rec.flag(_near(abs(x0), x1))
            rec.flag(_near(abs(a6[c]), x1))

    # top
    if iv == 0:
        al[0] = max(0.0, al[0])
    elif iv == -1:
        if al[0] * a[0] <= 0.0:
            al[0] = 0.0
    elif iv == 2:
        al[0] = a[0]
        ar[0] = a[0]
        a6[0] = 0.0
    if iv == -1:
        rec.cell = 0
        rec.flag(_near(al[0] * a[0], 0.0, scale2))
    if iv != 2:
        a6[0] = 3.0 * (2.0 * a[0] - (al[0] + ar[0]))
        rec.cell = 0
        al[0], ar[0], a6[0] = cs_limiters_ref(a[0], al[0], ar[0], a6[0],
                                              extm[0], 1, rec)
    a6[1] = 3.0 * (2.0 * a[1] - (al[1] + ar[1]))
    rec.cell = 1
    al[1], ar[1], a6[1] = cs_limiters_ref(a[1], al[1], ar[1], a6[1],
                                          extm[1], 2, rec)

    def huynh(c):
        pmp_1 = a[c] - 2.0 * dA[c + 1]
        lac_1 = pmp_1 + 1.5 * dA[c + 2]
        aln = min(max(al[c], min(a[c], pmp_1, lac_1)),
                  max(a[c], pmp_1, lac_1))
        pmp_2 = a[c] + 2.0 * dA[c]
        lac_2 = pmp_2 - 1.5 * dA[c - 1]
        arn = min(max(ar[c], min(a[c], pmp_2, lac_2)),
                  max(a[c], pmp_2, lac_2))
        return aln, arn

    ak = abs(kord)
    for c in range(2, km - 2):
        rec.cell = c
        if ak in (9, 12):
            a6g = 6.0 * a[c] - 3.0 * (al[c] + ar[c])
            rec.flag(_near(abs(a6g), abs(al[c] - ar[c])))
        if ak < 9:
            al[c], ar[c] = huynh(c)
            a6[c] = 3.0 * (2.0 * a[c] - (al[c] + ar[c]))
        elif ak == 9:
            if extm[c] and (extm[c - 1] or extm[c + 1]):
                al[c] = a[c]
                ar[c] = a[c]
                a6[c] = 0.0
            else:
                a6[c] = 6.0 * a[c] - 3.0 * (al[c] + ar[c])
                if abs(a6[c]) > abs(al[c] - ar[c]):
                    al[c], ar[c] = huynh(c)
                    a6[c] = 6.0 * a[c] - 3.0 * (al[c] + ar[c])
        elif ak == 10:
            if ext5[c]:
                if ext5[c - 1] or ext5[c + 1]:
                    al[c] = a[c]
                    ar[c] = a[c]
                elif ext6[c - 1] or ext6[c + 1]:
                    al[c], ar[c] = huynh(c)
            elif ext6[c]:
                if ext5[c - 1] or ext5[c + 1]:
                    al[c], ar[c] = huynh(c)
            a6[c] = 3.0 * (2.0 * a[c] - (al[c] + ar[c]))
        elif ak == 12:
            if extm[c]:
                al[c] = a[c]
                ar[c] = a[c]
                a6[c] = 0.0
            else:
                a6[c] = 6.0 * a[c] - 3.0 * (al[c] + ar[c])
                if abs(a6[c]) > abs(al[c] - ar[c]):
                    al[c], ar[c] = huynh(c)
                    a6[c] = 6.0 * a[c] - 3.0 * (al[c] + ar[c])
        elif ak == 13:
            if ext6[c] and ext6[c - 1] and ext6[c + 1]:
                al[c] = a[c]
                ar[c] = a[c]
            a6[c] = 3.0 * (2.0 * a[c] - (al[c] + ar[c]))
        elif ak == 14:
            a6[c] = 3.0 * (2.0 * a[c] - (al[c] + ar[c]))
        elif ak == 15:
            if ext5[c]:
                if ext5[c - 1] or ext5[c + 1]:
                    al[c] = a[c]
                    ar[c] = a[c]
            elif ext6[c]:
                al[c], ar[c] = huynh(c)
            a6[c] = 3.0 * (2.0 * a[c] - (al[c] + ar[c]))
        elif ak == 16:
            if ext5[c]:
                if ext5[c - 1] or ext5[c + 1]:
                    al[c] = a[c]
                    ar[c] = a[c]
                elif ext6[c - 1] or ext6[c + 1]:
                    al[c], ar[c] = huynh(c)
            a6[c] = 3.0 * (2.0 * a[c] - (al[c] + ar[c]))
        else:  # 11
            if ext5[c] and (ext5[c - 1] or ext5[c + 1]):
                al[c] = a[c]
                ar[c] = a[c]
                a6[c] = 0.0
            else:
                a6[c] = 3.0 * (2.0 * a[c] - (al[c] + ar[c]))
        if iv == 0:
            al[c], ar[c], a6[c] = cs_limiters_ref(a[c], al[c], ar[c], a6[c],
                                                  extm[c], 0, rec)

    # bottom
    if iv == 0:
        ar[km - 1] = max(0.0, ar[km - 1])
    elif iv == -1:
        rec.cell = km - 1
        rec.flag(_near(ar[km - 1] * a[km - 1], 0.0, scale2))
        if ar[km - 1] * a[km - 1] <= 0.0:
            ar[km - 1] = 0.0
    for c, mode in ((km - 2, 2), (km - 1, 1)):
        a6[c] = 3.0 * (2.0 * a[c] - (al[c] + ar[c]))
        rec.cell = c
        al[c], ar[c], a6[c] = cs_limiters_ref(a[c], al[c], ar[c], a6[c],
                                              extm[c], mode, rec)
    if return_ties:
        return al, ar, a6, rec.dilated()
    return al, ar, a6


def ppm_limiters_ref(dm, a, al, ar, a6, lmt, rec=_NOREC):
    s = abs(a) + abs(al) + abs(ar)
    if lmt == 3:
        return al, ar, a6
    if lmt == 0:
        # dm == 0.0 exactly is reproducible (min/max clamp output); only a
        # *near*-zero dm is branch-unstable across implementations
        rec.flag(dm != 0.0 and _near(dm, 0.0, s))
        if dm == 0.0:
            return a, a, 0.0
        da1 = ar - al
        da2 = da1 ** 2
        a6da = a6 * da1
        if a6da < -da2:
            a6n = 3.0 * (al - a)
            return al, al - a6n, a6n
        elif a6da > da2:
            a6n = 3.0 * (ar - a)
            return ar - a6n, ar, a6n
        return al, ar, a6
    if lmt == 1:
        qmp = 2.0 * dm
        s = 1.0 if qmp >= 0 else -1.0
        aln = a - s * min(abs(qmp), abs(al - a))
        arn = a + s * min(abs(qmp), abs(ar - a))
        return aln, arn, 3.0 * (2.0 * a - (aln + arn))
    if lmt == 2:
        if not (al == ar and a6 == 0.0):
            rec.flag(_near(abs(ar - al), -a6, s))
        if abs(ar - al) < -a6:
            fmin = a + 0.25 * (ar - al) ** 2 / a6 + a6 / 12.0
            rec.flag(_near(fmin, 0.0, s))
            if fmin < 0.0:
                rec.flag(_near(a, ar, s) or _near(a, al, s)
                         or _near(ar, al, s))
                if a < ar and a < al:
                    return a, a, 0.0
                elif ar > al:
                    a6n = 3.0 * (al - a)
                    return al, al - a6n, a6n
                else:
                    a6n = 3.0 * (ar - a)
                    return ar - a6n, ar, a6n
        return al, ar, a6
    raise ValueError(lmt)


def ppm_profile_ref(a, dp, iv, kord, return_ties=False):
    a = np.asarray(a, float)
    dp = np.asarray(dp, float)
    km = len(a)
    rec = TieRec(km) if return_ties else _NOREC
    scale2 = max(1.0, float(np.abs(a).max())) ** 2
    al = np.zeros(km)
    ar = np.zeros(km)
    a6 = np.zeros(km)
    dc = np.zeros(km)
    delq = np.zeros(km)  # delq[c] = a[c+1] - a[c]
    d4 = np.zeros(km + 1)  # d4[c] = dp[c-1] + dp[c]
    h2 = np.zeros(km)
    delq[: km - 1] = a[1:] - a[:-1]
    d4[1:km] = dp[:-1] + dp[1:]

    for c in range(1, km - 1):
        c1 = (dp[c - 1] + 0.5 * dp[c]) / d4[c + 1]
        c2 = (dp[c + 1] + 0.5 * dp[c]) / d4[c]
        df2 = dp[c] * (c1 * delq[c] + c2 * delq[c - 1]) / (d4[c] + dp[c + 1])
        amax = max(a[c - 1], a[c], a[c + 1])
        amin = min(a[c - 1], a[c], a[c + 1])
        s = 1.0 if df2 >= 0 else -1.0
        dc[c] = s * min(abs(df2), amax - a[c], a[c] - amin)

    for c in range(2, km - 1):
        c1 = delq[c - 1] * dp[c - 1] / d4[c]
        a1 = d4[c - 1] / (d4[c] + dp[c - 1])
        a2 = d4[c + 1] / (d4[c] + dp[c])
        al[c] = a[c - 1] + c1 + 2.0 / (d4[c - 1] + d4[c + 1]) * (
            dp[c] * (c1 * (a1 - a2) + a2 * dc[c - 1]) - dp[c - 1] * a1 * dc[c]
        )

    # top cubic
    d1, d2 = dp[0], dp[1]
    qm = (d2 * a[0] + d1 * a[1]) / (d1 + d2)
    dq = 2.0 * (a[1] - a[0]) / (d1 + d2)
    c1 = 4.0 * (al[2] - qm - d2 * dq) / (
        d2 * (2.0 * d2 * d2 + d1 * (d2 + 3.0 * d1))
    )
    c3 = dq - 0.5 * c1 * (d2 * (5.0 * d1 + d2) - 3.0 * d1 * d1)
    al[1] = qm - 0.25 * c1 * d1 * d2 * (d2 + 3.0 * d1)
    al[0] = d1 * (2.0 * c1 * d1 * d1 - c3) + al[1]
    al[1] = min(max(al[1], min(a[0], a[1])), max(a[0], a[1]))
    dc[0] = 0.5 * (al[1] - a[0])

    ar0_override = None
    if iv == 0:
        al[0] = max(0.0, al[0])
        al[1] = max(0.0, al[1])
    elif iv == -1:
        rec.cell = 0
        rec.flag(_near(al[0] * a[0], 0.0, scale2))
        if al[0] * a[0] <= 0.0:
            al[0] = 0.0
    elif abs(iv) == 2:
        al[0] = a[0]
        ar0_override = a[0]

    # bottom cubic
    d1, d2 = dp[km - 1], dp[km - 2]
    qm = (d2 * a[km - 1] + d1 * a[km - 2]) / (d1 + d2)
    dq = 2.0 * (a[km - 2] - a[km - 1]) / (d1 + d2)
    c1 = (al[km - 1] - qm - d2 * dq) / (
        d2 * (2.0 * d2 * d2 + d1 * (d2 + 3.0 * d1))
    )
    c3 = dq - 2.0 * c1 * (d2 * (5.0 * d1 + d2) - 3.0 * d1 * d1)
    al[km - 1] = qm - c1 * d1 * d2 * (d2 + 3.0 * d1)
    ar_bot = d1 * (8.0 * c1 * d1 * d1 - c3) + al[km - 1]
    al[km - 1] = min(
        max(al[km - 1], min(a[km - 1], a[km - 2])), max(a[km - 1], a[km - 2])
    )
    dc[km - 1] = 0.5 * (a[km - 1] - al[km - 1])
    if iv == 0:
        al[km - 1] = max(0.0, al[km - 1])
        ar_bot = max(0.0, ar_bot)
    elif iv < 0:
        rec.cell = km - 1
        rec.flag(_near(a[km - 1] * ar_bot, 0.0, scale2))
        if a[km - 1] * ar_bot <= 0.0:
            ar_bot = 0.0

    ar[: km - 1] = al[1:]
    ar[km - 1] = ar_bot
    if ar0_override is not None:
        ar[0] = ar0_override

    for c in (0, 1):
        a6[c] = 3.0 * (2.0 * a[c] - (al[c] + ar[c]))
        rec.cell = c
        al[c], ar[c], a6[c] = ppm_limiters_ref(dc[c], a[c], al[c], ar[c],
                                               a6[c], 0, rec)

    if kord >= 7:
        for c in range(1, km - 1):
            h2[c] = (
                2.0
                * (dc[c + 1] / dp[c + 1] - dc[c - 1] / dp[c - 1])
                / (dp[c] + 0.5 * (dp[c - 1] + dp[c + 1]))
                * dp[c] ** 2
            )
        fac = 1.5
        for c in range(2, km - 2):
            pmp = 2.0 * dc[c]
            qmp = a[c] + pmp
            lac = a[c] + fac * h2[c - 1] + dc[c]
            ar[c] = min(max(ar[c], min(a[c], qmp, lac)),
                        max(a[c], qmp, lac))
            qmp = a[c] - pmp
            lac = a[c] + fac * h2[c + 1] - dc[c]
            al[c] = min(max(al[c], min(a[c], qmp, lac)),
                        max(a[c], qmp, lac))
            a6[c] = 3.0 * (2.0 * a[c] - (al[c] + ar[c]))
            if iv == 0 and kord >= 6:
                rec.cell = c
                al[c], ar[c], a6[c] = ppm_limiters_ref(
                    dc[c], a[c], al[c], ar[c], a6[c], 2, rec
                )
    else:
        lmt = max(0, kord - 3)
        if iv == 0:
            lmt = min(2, lmt)
        for c in range(2, km - 2):
            if kord != 4:
                a6[c] = 3.0 * (2.0 * a[c] - (al[c] + ar[c]))
            if kord != 6:
                rec.cell = c
                al[c], ar[c], a6[c] = ppm_limiters_ref(
                    dc[c], a[c], al[c], ar[c], a6[c], lmt, rec
                )

    for c in (km - 2, km - 1):
        a6[c] = 3.0 * (2.0 * a[c] - (al[c] + ar[c]))
        rec.cell = c
        al[c], ar[c], a6[c] = ppm_limiters_ref(dc[c], a[c], al[c], ar[c],
                                               a6[c], 0, rec)
    if return_ties:
        return al, ar, a6, rec.dilated()
    return al, ar, a6


def mappm_ref(q1, pe1, pe2, iv, kord, qs=0.0, profile=None):
    """Single-column remap; q1 [km], pe1 [km+1], pe2 [kn+1].

    If `profile` is given as (al, ar, a6), the reconstruction step is
    skipped and the supplied parabola coefficients are integrated --
    used to test the integration independently of limiter branch ties.
    """
    q1 = np.asarray(q1, float)
    pe1 = np.asarray(pe1, float)
    pe2 = np.asarray(pe2, float)
    km = len(q1)
    kn = len(pe2) - 1
    dp1 = pe1[1:] - pe1[:-1]
    if profile is not None:
        al, ar, a6 = profile
    elif kord > 7:
        al, ar, a6 = cs_profile_ref(q1, dp1, iv, kord, qs)
    else:
        al, ar, a6 = ppm_profile_ref(q1, dp1, iv, kord)

    q2 = np.zeros(kn)
    r3 = 1.0 / 3.0
    r23 = 2.0 / 3.0
    for k in range(kn):
        if pe2[k] <= pe1[0]:
            q2[k] = q1[0]
            continue
        if pe2[k] >= pe1[km]:
            q2[k] = q1[km - 1]
            continue
        # locate containing source layer
        done = False
        for L in range(km):
            if pe1[L] <= pe2[k] <= pe1[L + 1]:
                pl = (pe2[k] - pe1[L]) / dp1[L]
                if pe2[k + 1] <= pe1[L + 1]:
                    pr = (pe2[k + 1] - pe1[L]) / dp1[L]
                    tt = r3 * (pr * (pr + pl) + pl ** 2)
                    q2[k] = (
                        al[L]
                        + 0.5 * (a6[L] + ar[L] - al[L]) * (pr + pl)
                        - a6[L] * tt
                    )
                    done = True
                    break
                delp = pe1[L + 1] - pe2[k]
                tt = r3 * (1.0 + pl * (1.0 + pl))
                qsum = delp * (
                    al[L]
                    + 0.5 * (a6[L] + ar[L] - al[L]) * (1.0 + pl)
                    - a6[L] * tt
                )
                dpsum = delp
                for L2 in range(L + 1, km):
                    if pe2[k + 1] > pe1[L2 + 1]:
                        qsum += dp1[L2] * q1[L2]
                        dpsum += dp1[L2]
                    else:
                        delp = pe2[k + 1] - pe1[L2]
                        esl = delp / dp1[L2]
                        qsum += delp * (
                            al[L2]
                            + 0.5
                            * esl
                            * (ar[L2] - al[L2] + a6[L2] * (1.0 - r23 * esl))
                        )
                        dpsum += delp
                        break
                else:
                    delp = pe2[k + 1] - pe1[km]
                    if delp > 0.0:
                        qsum += delp * q1[km - 1]
                        dpsum += delp
                q2[k] = qsum / dpsum
                done = True
                break
        assert done
    return q2
