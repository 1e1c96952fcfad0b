"""Jittable image-processing primitives.

These replace the scipy.ndimage / scikit-image / cupy primitives the
reference pipeline calls into (SURVEY.md §2: separable Gaussian, Hessian,
symmetric eigensolvers, histogram thresholds, connected components, EDT,
thinning, rank filters, segment reductions) with TPU-friendly JAX/XLA
implementations: static shapes, no data-dependent control flow, dense
masked compute instead of gather/scatter.
"""
