"""BN254 optimal-ate pairing — host-side reference implementation.

Ground truth for the pairing guest (vm/guests.py::pairing_guest), mirroring
the workload of /root/reference/openvm-riscv/guest-pairing/src/main.rs
(openvm_pairing::bn254 multi-Miller-loop + final exponentiation).  Pure
python integers; used to generate the guest's expected output and the
fixed Miller-loop/final-exp schedules the emitter unrolls.

Tower: Fp2 = Fp[u]/(u^2+1);  Fp6 = Fp2[v]/(v^3 - xi), xi = 9 + u;
Fp12 = Fp6[w]/(w^2 - v).  Fp12 elements are represented flat as 6 Fp2
coefficients c[i] of w^i with w^6 = xi (the two views are isomorphic;
the flat view matches the guest's memory layout).

D-type twist: G2 lives on y^2 = x^3 + 3/xi.
"""
from __future__ import annotations

from typing import List, Tuple

P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R_ORDER = 21888242871839275222246405745257275088548364400416034343698204186575808495617
X_BN = 4965661367192848881  # BN curve parameter
ATE_LOOP = 6 * X_BN + 2

Fp2 = Tuple[int, int]

# -- Fp2 ----------------------------------------------------------------------


def f2_add(a: Fp2, b: Fp2) -> Fp2:
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def f2_sub(a: Fp2, b: Fp2) -> Fp2:
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def f2_neg(a: Fp2) -> Fp2:
    return ((-a[0]) % P, (-a[1]) % P)


def f2_mul(a: Fp2, b: Fp2) -> Fp2:
    return (
        (a[0] * b[0] - a[1] * b[1]) % P,
        (a[0] * b[1] + a[1] * b[0]) % P,
    )


def f2_sqr(a: Fp2) -> Fp2:
    # (a0+a1 u)^2 = (a0-a1)(a0+a1) + 2 a0 a1 u
    return ((a[0] - a[1]) * (a[0] + a[1]) % P, 2 * a[0] * a[1] % P)


def f2_scalar(a: Fp2, k: int) -> Fp2:
    return (a[0] * k % P, a[1] * k % P)


def f2_conj(a: Fp2) -> Fp2:
    return (a[0], (-a[1]) % P)


def f2_inv(a: Fp2) -> Fp2:
    n = (a[0] * a[0] + a[1] * a[1]) % P
    ninv = pow(n, P - 2, P)
    return (a[0] * ninv % P, (-a[1]) * ninv % P)


def f2_mul_xi(a: Fp2) -> Fp2:
    """Multiply by xi = 9 + u."""
    return ((9 * a[0] - a[1]) % P, (9 * a[1] + a[0]) % P)


XI: Fp2 = (9, 1)

# -- Fp12 as 6 Fp2 coefficients of w^i, w^6 = xi ------------------------------

Fp12 = Tuple[Fp2, ...]

F12_ONE: Fp12 = ((1, 0), (0, 0), (0, 0), (0, 0), (0, 0), (0, 0))


def f12_mul(a: Fp12, b: Fp12) -> Fp12:
    acc: List[Fp2] = [(0, 0)] * 11
    for i in range(6):
        if a[i] == (0, 0):
            continue
        for j in range(6):
            if b[j] == (0, 0):
                continue
            acc[i + j] = f2_add(acc[i + j], f2_mul(a[i], b[j]))
    out = list(acc[:6])
    for k in range(6, 11):
        out[k - 6] = f2_add(out[k - 6], f2_mul_xi(acc[k]))
    return tuple(out)


def f12_sqr(a: Fp12) -> Fp12:
    return f12_mul(a, a)


def f12_conj(a: Fp12) -> Fp12:
    """Conjugation = Frobenius^6: negates odd coefficients of w."""
    return tuple(f2_neg(c) if i % 2 else c for i, c in enumerate(a))


# Frobenius: (c_i w^i)^p = c_i^p gamma_i w^i with gamma_i = xi^(i(p-1)/6)
_FROB_GAMMA = [pow_xi := None]


def _xi_pow(e: int) -> Fp2:
    out: Fp2 = (1, 0)
    base: Fp2 = XI
    while e:
        if e & 1:
            out = f2_mul(out, base)
        base = f2_sqr(base)
        e >>= 1
    return out


GAMMA_1 = [_xi_pow(i * (P - 1) // 6) for i in range(6)]
GAMMA_2 = [f2_mul(GAMMA_1[i], f2_conj(GAMMA_1[i])) for i in range(6)]
GAMMA_3 = [f2_mul(GAMMA_1[i], GAMMA_2[i]) for i in range(6)]


def f12_frob(a: Fp12, power: int = 1) -> Fp12:
    g = {1: GAMMA_1, 2: GAMMA_2, 3: GAMMA_3}[power]
    out = []
    for i, c in enumerate(a):
        cc = c if power == 2 else f2_conj(c)
        out.append(f2_mul(cc, g[i]))
    return tuple(out)


def f12_inv(a: Fp12) -> Fp12:
    """Inverse via the tower: treat as (c0 + c1 w) over Fp6=span(w^0,w^2,w^4)
    is messy in flat form — use linear algebra free route: conjugate norm
    chain N(a) = a * a^p * ... is overkill; instead solve with the v-tower."""
    # convert flat -> tower Fp6[w]: e0 = (a0, a2, a4), e1 = (a1, a3, a5)
    c0 = (a[0], a[2], a[4])
    c1 = (a[1], a[3], a[5])

    def f6_mul(x, y):
        a0, a1, a2 = x
        b0, b1, b2 = y
        t0 = f2_mul(a0, b0)
        t1 = f2_mul(a1, b1)
        t2 = f2_mul(a2, b2)
        c0_ = f2_add(t0, f2_mul_xi(f2_sub(f2_mul(f2_add(a1, a2), f2_add(b1, b2)), f2_add(t1, t2))))
        c1_ = f2_add(f2_sub(f2_mul(f2_add(a0, a1), f2_add(b0, b1)), f2_add(t0, t1)), f2_mul_xi(t2))
        c2_ = f2_add(f2_sub(f2_mul(f2_add(a0, a2), f2_add(b0, b2)), f2_add(t0, t2)), t1)
        return (c0_, c1_, c2_)

    def f6_mul_v(x):
        return (f2_mul_xi(x[2]), x[0], x[1])

    def f6_neg(x):
        return tuple(f2_neg(c) for c in x)

    def f6_inv(x):
        a0, a1, a2 = x
        t0 = f2_sub(f2_sqr(a0), f2_mul_xi(f2_mul(a1, a2)))
        t1 = f2_sub(f2_mul_xi(f2_sqr(a2)), f2_mul(a0, a1))
        t2 = f2_sub(f2_sqr(a1), f2_mul(a0, a2))
        norm = f2_add(f2_mul(a0, t0), f2_mul_xi(f2_add(f2_mul(a2, t1), f2_mul(a1, t2))))
        ninv = f2_inv(norm)
        return (f2_mul(t0, ninv), f2_mul(t1, ninv), f2_mul(t2, ninv))

    # (c0 + c1 w)^-1 = (c0 - c1 w) / (c0^2 - c1^2 v)
    d = _f6_sub(f6_mul(c0, c0), f6_mul_v(f6_mul(c1, c1)))
    dinv = f6_inv(d)
    e0 = f6_mul(c0, dinv)
    e1 = f6_neg(f6_mul(c1, dinv))
    return (e0[0], e1[0], e0[1], e1[1], e0[2], e1[2])


def _f6_sub(x, y):
    return tuple(f2_sub(a, b) for a, b in zip(x, y))


def f12_pow(a: Fp12, e: int) -> Fp12:
    out = F12_ONE
    base = a
    while e:
        if e & 1:
            out = f12_mul(out, base)
        base = f12_sqr(base)
        e >>= 1
    return out


# -- G1 / G2 ------------------------------------------------------------------

G1 = (1, 2)
# standard BN254 G2 generator (c1*u + c0 listed as (c0, c1))
G2_X: Fp2 = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
G2_Y: Fp2 = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)


def g1_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and (y1 + y2) % P == 0:
        return None
    if p1 == p2:
        lam = 3 * x1 * x1 * pow(2 * y1, P - 2, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, P - 2, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def g1_mul(p1, k):
    out = None
    add = p1
    while k:
        if k & 1:
            out = g1_add(out, add)
        add = g1_add(add, add)
        k >>= 1
    return out


def g2_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and f2_add(y1, y2) == (0, 0):
        return None
    if p1 == p2:
        lam = f2_mul(f2_scalar(f2_sqr(x1), 3), f2_inv(f2_scalar(y1, 2)))
    else:
        lam = f2_mul(f2_sub(y2, y1), f2_inv(f2_sub(x2, x1)))
    x3 = f2_sub(f2_sub(f2_sqr(lam), x1), x2)
    return (x3, f2_sub(f2_mul(lam, f2_sub(x1, x3)), y1))


def g2_mul(p2, k):
    out = None
    add = p2
    while k:
        if k & 1:
            out = g2_add(out, add)
        add = g2_add(add, add)
        k >>= 1
    return out


# -- Miller loop (affine, matches the guest's schedule) -----------------------


def _naf(v: int) -> List[int]:
    out = []
    while v:
        if v & 1:
            d = 2 - (v % 4)
            out.append(d)
            v -= d
        else:
            out.append(0)
        v >>= 1
    return out


ATE_NAF = _naf(ATE_LOOP)  # LSB first


def _line(t, q, pt) -> Tuple[Fp2, Fp2, Fp2]:
    """Line through t and q (or tangent at t if t==q) evaluated at the
    G1 point pt=(x,y): returns sparse Fp12 coefficients (l0, l1, l4) of
    1*w^0? — we use the standard D-type sparse form:
        l(P) = lam*x_P * w -  y_P * lam? ...
    Implemented directly: line: y - y_t - lam (x - x_t) = 0 over Fp2,
    evaluated with x = x_P (Fp), y = y_P (Fp) sitting in w-graded slots:
    for the D-type twist with Q' = (x w^2, y w^3) untwisting, the line
    evaluated at P gives the Fp12 element
        l = (y_P * 1)          in slot 0 scaled? --
    To stay unambiguous we evaluate the line in full Fp12 arithmetic:
    x_Q lives at w^2, y_Q at w^3 (untwist embedding), x_P/y_P in slot 0."""
    x_t, y_t = t
    if t == q:
        lam = f2_mul(f2_scalar(f2_sqr(x_t), 3), f2_inv(f2_scalar(y_t, 2)))
    else:
        x_q, y_q = q
        lam = f2_mul(f2_sub(y_q, y_t), f2_inv(f2_sub(x_q, x_t)))
    x_p, y_p = pt
    # untwist psi(x', y') = (x' w^2, y' w^3), slope lifts to lam*w, so
    # l(P) = y_P - y_t w^3 - lam w (x_P - x_t w^2)
    #      = y_P w^0 - (lam x_P) w^1 + (lam x_t - y_t) w^3
    c0: Fp2 = (y_p % P, 0)
    c1 = f2_neg(f2_scalar(lam, x_p))
    c3 = f2_sub(f2_mul(lam, x_t), y_t)
    l: Fp12 = (c0, c1, (0, 0), c3, (0, 0), (0, 0))
    return l


def miller_loop(pt, q) -> Fp12:
    """Optimal ate Miller loop f_{6x+2,Q}(P) with the two Frobenius
    correction lines."""
    f = F12_ONE
    t = q
    for d in reversed(ATE_NAF[:-1]):
        f = f12_sqr(f)
        f = f12_mul(f, _line(t, t, pt))
        t = g2_add(t, t)
        if d == 1:
            f = f12_mul(f, _line(t, q, pt))
            t = g2_add(t, q)
        elif d == -1:
            nq = (q[0], f2_neg(q[1]))
            f = f12_mul(f, _line(t, nq, pt))
            t = g2_add(t, nq)
    # Frobenius steps: Q1 = pi(Q), Q2 = -pi^2(Q)
    q1 = (f2_mul(f2_conj(q[0]), GAMMA_1[2]), f2_mul(f2_conj(q[1]), GAMMA_1[3]))
    q2_ = (f2_mul(q[0], GAMMA_2[2]), f2_neg(f2_mul(q[1], GAMMA_2[3])))
    f = f12_mul(f, _line(t, q1, pt))
    t = g2_add(t, q1)
    f = f12_mul(f, _line(t, q2_, pt))
    return f


# -- inversion-free Miller loop (the guest's schedule) ------------------------
# Jacobian G2 coordinates; line coefficients are polynomial in (X, Y, Z)
# so the whole loop needs no field inversion (the per-step Fp2 scaling of
# each line lies in a subfield and is killed by the final exponentiation).


def _jac_dbl_line(T, pt):
    """Jacobian doubling T=(X,Y,Z) -> 2T with the tangent-line coefficients
    scaled by 2YZ^3:  l = (2YZ^3*yp) w^0  - (3X^2 Z^2 xp) w^1  +
    (3X^3 - 2Y^2) w^3."""
    X, Y, Z = T
    xp, yp = pt
    A = f2_sqr(X)
    B = f2_sqr(Y)
    C = f2_sqr(B)
    D = f2_scalar(f2_sub(f2_sub(f2_sqr(f2_add(X, B)), A), C), 2)
    E = f2_scalar(A, 3)
    F = f2_sqr(E)
    X3 = f2_sub(F, f2_scalar(D, 2))
    Y3 = f2_sub(f2_mul(E, f2_sub(D, X3)), f2_scalar(C, 8))
    ZZ = f2_sqr(Z)
    Z3 = f2_scalar(f2_mul(Y, Z), 2)
    c0 = f2_scalar(f2_mul(Z3, ZZ), yp)  # 2YZ^3 * yp
    c1 = f2_neg(f2_scalar(f2_mul(E, ZZ), xp))  # -3X^2 Z^2 * xp
    c3 = f2_sub(f2_mul(E, X), f2_scalar(B, 2))  # 3X^3 - 2Y^2
    l: Fp12 = (c0, c1, (0, 0), c3, (0, 0), (0, 0))
    return (X3, Y3, Z3), l


def _jac_madd_line(T, q, pt):
    """Mixed addition T + Q (Q affine) with the chord-line coefficients
    scaled by Z3 = 2ZH:  l = (Z3*yp) w^0 - (rr*xp) w^1 +
    (rr*xq - Z3*yq) w^3."""
    X, Y, Z = T
    xq, yq = q
    xp, yp = pt
    ZZ = f2_sqr(Z)
    U = f2_mul(xq, ZZ)
    S = f2_mul(yq, f2_mul(ZZ, Z))
    H = f2_sub(U, X)
    HH = f2_sqr(H)
    I = f2_scalar(HH, 4)
    J = f2_mul(H, I)
    rr = f2_scalar(f2_sub(S, Y), 2)
    V = f2_mul(X, I)
    X3 = f2_sub(f2_sub(f2_sqr(rr), J), f2_scalar(V, 2))
    Y3 = f2_sub(f2_mul(rr, f2_sub(V, X3)), f2_scalar(f2_mul(Y, J), 2))
    Z3 = f2_scalar(f2_mul(Z, H), 2)
    c0 = f2_scalar(Z3, yp)
    c1 = f2_neg(f2_scalar(rr, xp))
    c3 = f2_sub(f2_mul(rr, xq), f2_mul(Z3, yq))
    l: Fp12 = (c0, c1, (0, 0), c3, (0, 0), (0, 0))
    return (X3, Y3, Z3), l


def f12_sparse_mul(f: Fp12, l: Fp12) -> Fp12:
    """f * l where l has nonzero coefficients only at w^0, w^1, w^3."""
    acc: List[Fp2] = [(0, 0)] * 11
    for j in (0, 1, 3):
        if l[j] == (0, 0):
            continue
        for i in range(6):
            acc[i + j] = f2_add(acc[i + j], f2_mul(f[i], l[j]))
    out = list(acc[:6])
    for k in range(6, 11):
        out[k - 6] = f2_add(out[k - 6], f2_mul_xi(acc[k]))
    return tuple(out)


def miller_loop_projective(pt, q, truncate: int = None) -> Fp12:
    """Same value as miller_loop after final exponentiation (per-line Fp2
    scalings die there) but with NO field inversions — the schedule the
    guest executes.  truncate: run only the first k digits and skip the
    Frobenius lines (the guest's CI-sized variant)."""
    f = F12_ONE
    T = (q[0], q[1], (1, 0))
    nq = (q[0], f2_neg(q[1]))
    sched = list(reversed(ATE_NAF[:-1]))
    if truncate is not None:
        sched = sched[:truncate]
    for d in sched:
        f = f12_sqr(f)
        T, l = _jac_dbl_line(T, pt)
        f = f12_sparse_mul(f, l)
        if d == 1:
            T, l = _jac_madd_line(T, q, pt)
            f = f12_sparse_mul(f, l)
        elif d == -1:
            T, l = _jac_madd_line(T, nq, pt)
            f = f12_sparse_mul(f, l)
    if truncate is not None:
        return f
    q1 = (f2_mul(f2_conj(q[0]), GAMMA_1[2]), f2_mul(f2_conj(q[1]), GAMMA_1[3]))
    q2_ = (f2_mul(q[0], GAMMA_2[2]), f2_neg(f2_mul(q[1], GAMMA_2[3])))
    T, l = _jac_madd_line(T, q1, pt)
    f = f12_sparse_mul(f, l)
    T, l = _jac_madd_line(T, q2_, pt)
    f = f12_sparse_mul(f, l)
    return f


def final_exponentiation(f: Fp12) -> Fp12:
    """(p^12-1)/r = (p^6-1)(p^2+1) * (p^4-p^2+1)/r; hard part via the
    standard x-chain (Fuentes et al. style simple variant)."""
    # easy part
    f = f12_mul(f12_conj(f), f12_inv(f))  # f^(p^6 - 1)
    f = f12_mul(f12_frob(f, 2), f)  # ^(p^2 + 1)
    # hard part (Devegili et al. addition chain)
    x = X_BN
    fx = f12_pow(f, x)
    fx2 = f12_pow(fx, x)
    fx3 = f12_pow(fx2, x)
    y0 = f12_mul(f12_mul(f12_frob(f, 1), f12_frob(f, 2)), f12_frob(f, 3))
    y1 = f12_conj(f)
    y2 = f12_frob(fx2, 2)
    y3 = f12_conj(f12_frob(fx, 1))
    y4 = f12_conj(f12_mul(f12_frob(fx2, 1), fx))
    y5 = f12_conj(fx2)
    y6 = f12_conj(f12_mul(f12_frob(fx3, 1), fx3))
    t0 = f12_mul(f12_sqr(y6), f12_mul(y4, y5))
    t1 = f12_mul(f12_mul(y3, y5), t0)
    t0 = f12_mul(t0, y2)
    t1 = f12_mul(f12_sqr(t1), t0)
    t1 = f12_sqr(t1)
    t0 = f12_mul(t1, y1)
    t1 = f12_mul(t1, y0)
    t0 = f12_sqr(t0)
    return f12_mul(t1, t0)


def pairing(pt, q) -> Fp12:
    return final_exponentiation(miller_loop(pt, q))
