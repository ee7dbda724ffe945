"""Control-schedule parity vs the reference generator (oracle import)."""
import sys

import numpy as np
import pytest

from knode_cosserat_tpu import calc_controls

REF = "/root/reference/knode_cosserat"


def _ref_calc(kind, arg, del_t, n):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import physics_controls  # reference oracle
    return np.array(physics_controls.calc_controls(kind, arg, del_t, n))


@pytest.mark.parametrize("kind,arg", [
    ("sine", 0.5), ("sine", 1.25), ("step", 1.0), ("step", 2.5),
    ("random", 0.0), ("random", 3.0),
])
def test_controls_parity(kind, arg):
    ours = calc_controls(kind, arg, 0.05, 40)
    theirs = _ref_calc(kind, arg, 0.05, 40)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_ramp_fixed_here_broken_there():
    """The reference ramp references an undefined ramp_speed
    (physics_controls.py:26); here ramp_speed = control_arg."""
    ours = calc_controls("ramp", 2.0, 0.05, 5)
    np.testing.assert_allclose(ours[:, 0], 5 + 2.0 * 0.05 * np.arange(1, 6))
    np.testing.assert_allclose(ours[:, 1], 5.0)
    with pytest.raises(NameError):
        _ref_calc("ramp", 2.0, 0.05, 5)


def test_unknown_type_raises():
    with pytest.raises(ValueError):
        calc_controls("nope", 1.0, 0.05, 3)
