"""Weighted Gaussian kernel density estimation.

Equivalent of xrt/kde.py (Gaussian_kde:10, a weighted variant of
scipy.stats.gaussian_kde): automatic Scott/Silverman bandwidth with Kish's
effective sample size, weighted covariance, jnp evaluation (used by the
1D histogramming when ``axis.density='kde'``).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class GaussianKDE:
    """Weighted Gaussian KDE over a 1-D or (d, n) dataset."""

    def __init__(self, dataset, bw_method=None, weights=None):
        ds = np.atleast_2d(np.asarray(dataset, float))
        if ds.shape[0] > ds.shape[1]:
            ds = ds.T if ds.ndim == 2 and ds.shape[1] in (1, 2, 3) else ds
        self.dataset = ds
        self.d, self.n = self.dataset.shape
        if weights is not None:
            w = np.asarray(weights, float)
            self.weights = w / w.sum()
        else:
            self.weights = np.full(self.n, 1.0 / self.n)
        # Kish effective sample size
        self.neff = 1.0 / np.sum(self.weights ** 2)
        self.set_bandwidth(bw_method)

    # bandwidth rules (cf. kde.py scotts_factor/silverman_factor)
    def scotts_factor(self):
        return self.neff ** (-1.0 / (self.d + 4))

    def silverman_factor(self):
        return (self.neff * (self.d + 2) / 4.0) ** (-1.0 / (self.d + 4))

    covariance_factor = scotts_factor

    def set_bandwidth(self, bw_method=None):
        if bw_method is None or bw_method == 'scott':
            self.covariance_factor = self.scotts_factor
        elif bw_method == 'silverman':
            self.covariance_factor = self.silverman_factor
        elif np.isscalar(bw_method):
            self._bw = bw_method
            self.covariance_factor = lambda: self._bw
        elif callable(bw_method):
            self.covariance_factor = lambda: bw_method(self)
        else:
            raise ValueError("bw_method should be 'scott', 'silverman', a "
                             'scalar or a callable')
        self._compute_covariance()

    def _compute_covariance(self):
        self.factor = self.covariance_factor()
        # weighted covariance
        mean = np.sum(self.weights * self.dataset, axis=1)
        resid = self.dataset - mean[:, None]
        cov = np.einsum('in,jn,n->ij', resid, resid, self.weights)
        cov /= 1.0 - np.sum(self.weights ** 2)
        self.covariance = cov * self.factor ** 2
        self.inv_cov = np.linalg.inv(self.covariance)
        self._norm_factor = np.sqrt(
            np.linalg.det(2 * np.pi * self.covariance))

    def evaluate(self, points):
        """pdf at *points* — vectorized on device."""
        pts = jnp.atleast_2d(jnp.asarray(points, float))
        if pts.shape[0] != self.d:
            pts = pts.T
        data = jnp.asarray(self.dataset)            # (d, n)
        w = jnp.asarray(self.weights)
        invc = jnp.asarray(self.inv_cov)
        diff = data[:, None, :] - pts[:, :, None]   # (d, m, n)
        tdiff = jnp.einsum('ij,jmn->imn', invc, diff)
        energy = jnp.sum(diff * tdiff, axis=0) / 2.0
        return jnp.sum(w[None, :] * jnp.exp(-energy),
                       axis=1) / self._norm_factor

    __call__ = evaluate
    pdf = evaluate


Gaussian_kde = GaussianKDE
