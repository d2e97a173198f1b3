"""Piecewise rational-quadratic spline flows (VITS SDP plumbing).

Behavioral spec: reference `cosyvoice/speaker/transforms_sdp.py:1-205`
(neural-spline-flows lineage) and the ConvFlow / DDSConv coupling blocks in
`cosyvoice/speaker/modules.py:385-470` that consume it.  Dead code in the
shipped recipes (only the VITS stochastic duration predictor would use it,
which this fork's VitsDecoder drops), ported for surface completeness.

TPU-first: the torch version boolean-indexes the in-interval elements
(dynamic shapes); here the spline evaluates for EVERY element with inputs
clamped into the interval and a `where` selects the identity tail outside —
same results, static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted(bin_locations: jax.Array, inputs: jax.Array,
                  eps: float = 1e-6) -> jax.Array:
    locs = bin_locations.at[..., -1].add(eps)
    return jnp.sum(inputs[..., None] >= locs, axis=-1) - 1


def rational_quadratic_spline(inputs, unnormalized_widths,
                              unnormalized_heights, unnormalized_derivatives,
                              inverse=False, left=0.0, right=1.0, bottom=0.0,
                              top=1.0,
                              min_bin_width=DEFAULT_MIN_BIN_WIDTH,
                              min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
                              min_derivative=DEFAULT_MIN_DERIVATIVE):
    """transforms_sdp.py:102-205 — monotone RQ spline over [left,right]."""
    num_bins = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left).at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom).at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    bin_idx = _searchsorted(cumheights if inverse else cumwidths, inputs)
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)[..., None]

    take = lambda a: jnp.take_along_axis(a, bin_idx, axis=-1)[..., 0]
    input_cumwidths = take(cumwidths[..., :-1])
    input_bin_widths = take(widths)
    input_cumheights = take(cumheights[..., :-1])
    delta = heights / widths
    input_delta = take(delta)
    input_derivatives = take(derivatives[..., :-1])
    input_derivatives_plus_one = take(derivatives[..., 1:])
    input_heights = take(heights)

    d_sum = input_derivatives + input_derivatives_plus_one - 2 * input_delta
    if inverse:
        a = ((inputs - input_cumheights) * d_sum
             + input_heights * (input_delta - input_derivatives))
        b = (input_heights * input_derivatives
             - (inputs - input_cumheights) * d_sum)
        c = -input_delta * (inputs - input_cumheights)
        discriminant = b ** 2 - 4 * a * c
        root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(discriminant, 0.0)))
        outputs = root * input_bin_widths + input_cumwidths
        tomt = root * (1 - root)
        denominator = input_delta + d_sum * tomt
        derivative_numerator = input_delta ** 2 * (
            input_derivatives_plus_one * root ** 2
            + 2 * input_delta * tomt + input_derivatives * (1 - root) ** 2)
        logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, -logabsdet
    theta = (inputs - input_cumwidths) / input_bin_widths
    tomt = theta * (1 - theta)
    numerator = input_heights * (input_delta * theta ** 2
                                 + input_derivatives * tomt)
    denominator = input_delta + d_sum * tomt
    outputs = input_cumheights + numerator / denominator
    derivative_numerator = input_delta ** 2 * (
        input_derivatives_plus_one * theta ** 2
        + 2 * input_delta * tomt + input_derivatives * (1 - theta) ** 2)
    logabsdet = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
    return outputs, logabsdet


def unconstrained_rational_quadratic_spline(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, inverse=False, tails="linear",
        tail_bound=1.0, min_bin_width=DEFAULT_MIN_BIN_WIDTH,
        min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
        min_derivative=DEFAULT_MIN_DERIVATIVE):
    """transforms_sdp.py:56-99 — identity linear tails outside
    [-tail_bound, tail_bound]; static-shape where-select instead of the
    torch boolean indexing."""
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented.")
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    pad_cfg = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    ud = jnp.pad(unnormalized_derivatives, pad_cfg)
    constant = float(np.log(np.expm1(1 - min_derivative)))
    ud = ud.at[..., 0].set(constant).at[..., -1].set(constant)

    clamped = jnp.clip(inputs, -tail_bound, tail_bound)
    out_in, lad_in = rational_quadratic_spline(
        clamped, unnormalized_widths, unnormalized_heights, ud,
        inverse=inverse, left=-tail_bound, right=tail_bound,
        bottom=-tail_bound, top=tail_bound, min_bin_width=min_bin_width,
        min_bin_height=min_bin_height, min_derivative=min_derivative)
    outputs = jnp.where(inside, out_in, inputs)
    logabsdet = jnp.where(inside, lad_in, 0.0)
    return outputs, logabsdet


def piecewise_rational_quadratic_transform(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, inverse=False, tails=None, tail_bound=1.0,
        min_bin_width=DEFAULT_MIN_BIN_WIDTH,
        min_bin_height=DEFAULT_MIN_BIN_HEIGHT,
        min_derivative=DEFAULT_MIN_DERIVATIVE):
    """transforms_sdp.py:11-44 dispatch."""
    fn = rational_quadratic_spline if tails is None else \
        unconstrained_rational_quadratic_spline
    kwargs = {} if tails is None else {"tails": tails, "tail_bound": tail_bound}
    return fn(inputs, unnormalized_widths, unnormalized_heights,
              unnormalized_derivatives, inverse=inverse,
              min_bin_width=min_bin_width, min_bin_height=min_bin_height,
              min_derivative=min_derivative, **kwargs)
