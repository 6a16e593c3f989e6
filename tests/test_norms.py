"""Fused GroupNorm+SiLU op: CPU fallback correctness."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from cap4d_tpu.ops.norms import fused_group_norm_silu


def test_matches_flax_groupnorm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=64).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=64).astype(np.float32))

    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, use_scale=False, use_bias=False)
    ref = gn.apply({"params": {}}, x) * scale + bias
    ref_silu = ref * jax.nn.sigmoid(ref)

    out = fused_group_norm_silu(x, scale, bias, apply_silu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_silu), atol=1e-5)

    out_ns = fused_group_norm_silu(x, scale, bias, apply_silu=False)
    np.testing.assert_allclose(np.asarray(out_ns), np.asarray(ref), atol=1e-5)
