"""Model family registry tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from pmfm_tpu.models import TOPOLOGIES, get_topology


class TestTopologies:
    def test_registry(self):
        assert set(TOPOLOGIES) == {"fm2", "fm3_series", "fm3_parallel"}
        with pytest.raises(ValueError):
            get_topology("fm9")

    @pytest.mark.parametrize("name", ["fm2", "fm3_series", "fm3_parallel"])
    def test_descriptor_consistency(self, name):
        t = get_topology(name)
        assert len(t.param_names) == t.num_dimensions
        assert len(t.default_param_maxs) == t.num_dimensions
        p = jnp.asarray(np.full((2, t.num_dimensions), 0.4, np.float32)) * jnp.asarray(t.default_param_maxs)
        out = t.synthesize(p, 128)
        assert out.shape == (128, 2)
        assert np.isfinite(np.asarray(out)).all()
