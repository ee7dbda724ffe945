"""Generate the checked-in realworld-format fixtures under tests/fixtures/:
genuine bagpy-style per-topic CSV bundles recorded from the full
software-in-the-loop stack (teleop joystick pattern -> C++ firmware PID ->
winch plant -> telemetry -> simulated mocap), exactly the schema
prepare.py:173-297 ingests from a real rosbag.

Run once: python scripts/gen_sil_fixture.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from knode_cosserat_tpu.hw import JoyState, run_sil_experiment, \
    export_csv_bundle  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def main():
    # B-button step response, trigger_right -> parameter 2 (1100 g)
    joy_step = JoyState(axes=(0, 0, 1.0, 0, 0, 0.0),
                        buttons=(0, 1, 0, 0, 0, 0))
    vs = run_sil_experiment(joy_step, settle=0.5, tail=3.0)
    out = export_csv_bundle(vs, os.path.join(FIXTURES, "sil_step_1100"))
    print("sil_step_1100:", out["controls"].shape)

    # the same experiment as a genuine binary rosbag v2.0 file (the exact
    # `rosbag record` artifact the reference pipeline consumed), with a
    # non-commensurate firmware period as real hardware has
    from knode_cosserat_tpu.hw import export_bag
    vs = run_sil_experiment(joy_step, settle=0.5, tail=3.0, dt=0.0021)
    out = export_bag(vs, os.path.join(FIXTURES, "sil_step_1100.bag"))
    print("sil_step_1100.bag:", out["controls"].shape)

    # X-button sine sweep, parameter 0 (period 0.5 s)
    joy_sine = JoyState(axes=(0, 0, 1.0, 0, 0, 1.0),
                        buttons=(0, 0, 1, 0, 0, 0))
    vs = run_sil_experiment(joy_sine, settle=0.5, tail=1.0)
    out = export_csv_bundle(vs, os.path.join(FIXTURES, "sil_sine_p05"))
    print("sil_sine_p05:", out["controls"].shape)


if __name__ == "__main__":
    main()
