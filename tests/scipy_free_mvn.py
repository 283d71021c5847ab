"""Dense multivariate-normal log-density oracle (numpy only)."""

import numpy as np


def mvn_logpdf(y, mean, cov):
    d = len(y)
    diff = np.asarray(y) - np.asarray(mean)
    _, logdet = np.linalg.slogdet(cov)
    sol = np.linalg.solve(cov, diff)
    return -0.5 * (d * np.log(2 * np.pi) + logdet + diff @ sol)
