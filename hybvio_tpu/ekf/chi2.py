"""Chi-square 95% inverse-CDF table by degrees of freedom.

The reference embeds a Matlab-computed chi2inv(0.95, 0:199) table
(reference: src/odometry/util.hpp:23). We compute the same values with scipy
at import time instead of embedding constants.
"""
import numpy as np
from scipy.stats import chi2

MAX_DOF = 256
_table = chi2.ppf(0.95, np.arange(MAX_DOF))
_table[0] = 0.0
CHI2INV95 = _table  # numpy (converted to jnp where used)
