"""Independent pure-numpy fp64 oracle for the GOLDEN parity constants.

Re-derives every frozen literal in tests/test_golden.py from the published
formulas alone — Titsias (2009) collapsed ELBO and trace upper bound, the
exact-GP log marginal likelihood, and the CGLB bound of Artemev, Burt & van
der Wilk (ICML 2021) at converged v with its three log-det variants
(reference formulas: cglb/backend/tensorflow/models.py:58-105,150-192,
270-350 and gpflow SGPR elbo/upper_bound as consumed at
cglb/backend/tensorflow/interface.py:398-427).

Deliberately imports NOTHING from cglb_tpu: the snelson1d synthetic
stand-in is regenerated inline (the same deterministic recipe as
cglb_tpu/experiments/datasets.py, restated so a drift in either copy makes
the parity tests fail loudly), and all linear algebra is plain
numpy/scipy-free fp64.  Run

    python scripts/golden_oracle.py

to print the constants as JSON; tests/test_golden.py also imports this
module and recomputes them in-suite against the frozen literals.
"""

import json
import math

import numpy as np

JITTER = 1e-6
NOISE = 0.1
VARIANCE = 1.2
LENGTHSCALE = 0.8
NUM_INDUCING = 30


# ---- dataset: the deterministic snelson1d stand-in ----
# Same recipe as cglb_tpu/experiments/datasets.py:_synthetic + get_dataset
# (67/33 split at split=0, z-scored with train stats); restated here so the
# oracle stands alone.

def make_snelson_train():
    n, dim = 200, 1
    rng = np.random.default_rng(0 + n + dim)
    X = rng.normal(size=(n, dim))
    nf = 64
    W = rng.normal(size=(dim, nf)) / np.sqrt(dim)
    b = rng.uniform(0, 2 * np.pi, size=(nf,))
    w2 = rng.normal(size=(nf, 1)) / np.sqrt(nf)
    signal = np.sqrt(2.0) * np.cos(X @ W + b) @ w2
    Y = signal + 0.5 * np.std(signal) * rng.normal(size=(n, 1))

    rng_split = np.random.default_rng(0)
    perm = rng_split.permutation(n)
    ntr = int(n * 0.67)
    Xtr, Ytr = X[perm[:ntr]], Y[perm[:ntr]]

    def norm(a):
        mu = np.mean(a, axis=0, keepdims=True)
        std = np.std(a, axis=0, keepdims=True) + 1e-6
        return (a - mu) / std

    return norm(Xtr), norm(Ytr)


# ---- kernels ----

def _sq_dist(A, B, ls):
    As, Bs = A / ls, B / ls
    d2 = (
        np.sum(As * As, axis=1)[:, None]
        + np.sum(Bs * Bs, axis=1)[None, :]
        - 2.0 * As @ Bs.T
    )
    return np.maximum(d2, 0.0)


def kernel_matrix(family, A, B, var=VARIANCE, ls=LENGTHSCALE):
    d2 = _sq_dist(A, B, ls)
    if family == "rbf":
        return var * np.exp(-0.5 * d2)
    if family == "mat32":
        s3r = math.sqrt(3.0) * np.sqrt(d2)
        return var * (1.0 + s3r) * np.exp(-s3r)
    raise ValueError(family)


# ---- bound formulas (pure fp64, dense) ----

def lml(family, X, Y, noise=NOISE):
    """Exact GP log marginal likelihood, constant mean 0."""
    N, D = Y.shape
    Ky = kernel_matrix(family, X, X) + noise * np.eye(N)
    L = np.linalg.cholesky(Ky)
    alpha = np.linalg.solve(L, Y)
    return float(
        -0.5 * N * D * math.log(2 * math.pi)
        - D * np.sum(np.log(np.diag(L)))
        - 0.5 * np.sum(alpha * alpha)
    )


def _common(family, X, Z, noise, jitter=JITTER):
    M = Z.shape[0]
    Kuu = kernel_matrix(family, Z, Z) + jitter * np.eye(M)
    Kuf = kernel_matrix(family, Z, X)
    L = np.linalg.cholesky(Kuu)
    A = np.linalg.solve(L, Kuf) / math.sqrt(noise)
    AAT = A @ A.T
    LB = np.linalg.cholesky(AAT + np.eye(M))
    return L, A, AAT, LB


def elbo(family, X, Y, noise=NOISE, m=NUM_INDUCING):
    """Titsias (2009) collapsed ELBO."""
    N, D = Y.shape
    Z = X[:m]
    L, A, AAT, LB = _common(family, X, Z, noise)
    Aerr = A @ Y
    c = np.linalg.solve(LB, Aerr) / math.sqrt(noise)
    kdiag = np.full(N, VARIANCE)
    out = -0.5 * N * D * math.log(2 * math.pi)
    out -= D * np.sum(np.log(np.diag(LB)))
    out -= 0.5 * N * D * math.log(noise)
    out -= 0.5 * np.sum(Y * Y) / noise
    out += 0.5 * np.sum(c * c)
    out -= 0.5 * D * (np.sum(kdiag) / noise - np.trace(AAT))
    return float(out)


def upper(family, X, Y, noise=NOISE, m=NUM_INDUCING):
    """Titsias trace upper bound on the LML (gpflow SGPR.upper_bound)."""
    N = X.shape[0]
    Z = X[:m]
    M = Z.shape[0]
    Kuu = kernel_matrix(family, Z, Z) + JITTER * np.eye(M)
    Kuf = kernel_matrix(family, Z, X)
    L = np.linalg.cholesky(Kuu)
    A0 = np.linalg.solve(L, Kuf)  # sigma-free
    AAT0 = A0 @ A0.T
    kdiag = np.full(N, VARIANCE)
    cslack = max(float(np.sum(kdiag) - np.trace(AAT0)), 0.0)
    corrected = noise + cslack
    LB = np.linalg.cholesky(np.eye(M) + AAT0 / noise)
    LC = np.linalg.cholesky(np.eye(M) + AAT0 / corrected)
    v = np.linalg.solve(LC, A0 @ Y / corrected)
    out = -0.5 * N * math.log(2 * math.pi * noise)
    out -= np.sum(np.log(np.diag(LB)))
    out += -0.5 * np.sum(Y * Y) / corrected + 0.5 * np.sum(v * v)
    return float(out)


def cglb(family, X, Y, noise=NOISE, m=NUM_INDUCING, logdet="jensen"):
    """CGLB bound at converged v (exact solve): const + logdet_bound - quad.

    logdet: "jensen" (CGLB), "nm2" (CGLBNM2), "n2m" (CGLBN2M) — the three
    variants of reference tensorflow/models.py:77-105,270-350."""
    N, D = Y.shape
    Z = X[:m]
    L, A, AAT, LB = _common(family, X, Z, noise)
    kdiag = np.full(N, VARIANCE)
    trace = max(float(np.sum(kdiag) / noise - np.trace(AAT)), 0.0)
    logdiag_LB = float(np.sum(np.log(np.diag(LB))))

    if logdet == "jensen":
        ld = -D * logdiag_LB
        ld -= 0.5 * N * D * math.log(noise)
        ld -= 0.5 * D * N * math.log(1.0 + trace / N)
    elif logdet == "nm2":
        log_det_q = logdiag_LB + 0.5 * N * math.log(noise)
        ld = -(log_det_q + 0.5 * trace)
    elif logdet == "n2m":
        Kff_s = kernel_matrix(family, X, X) + noise * np.eye(N)
        C = np.linalg.solve(LB, A)
        tr_kff = float(np.trace(Kff_s))
        tr_qrest = float(np.trace((C @ Kff_s) @ C.T))
        log_trace = N * (
            math.log(max(tr_kff - tr_qrest, N * noise))
            - math.log(N) - math.log(noise)
        )
        log_det_q = logdiag_LB + 0.5 * N * math.log(noise)
        ld = -(log_det_q + 0.5 * log_trace)
    else:
        raise ValueError(logdet)

    Ky = kernel_matrix(family, X, X) + noise * np.eye(N)
    quad = 0.5 * float(np.sum(Y * np.linalg.solve(Ky, Y)))
    return float(-0.5 * N * D * math.log(2 * math.pi) + ld - quad)


def compute_all():
    X, Y = make_snelson_train()
    out = {}
    for family, tag in (("mat32", ""), ("rbf", "rbf_")):
        out[f"{tag}elbo"] = elbo(family, X, Y)
        out[f"{tag}upper"] = upper(family, X, Y)
        out[f"{tag}lml"] = lml(family, X, Y)
        out[f"{tag}cglb"] = cglb(family, X, Y)
    out["cglb_n2m"] = cglb("mat32", X, Y, logdet="n2m")
    out["cglb_nm2"] = cglb("mat32", X, Y, logdet="nm2")
    return out


if __name__ == "__main__":
    print(json.dumps({k: round(v, 10) for k, v in compute_all().items()},
                     indent=2))
