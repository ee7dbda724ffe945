"""The runnable catkin package (ros_ws/src/continuum_tpu) — VERDICT-r4
missing #2. Parity target: the reference package
(/root/reference/ros_ws/src/continuum/package.xml:47-56, node
src/motor_joy_teleop:13-156). These tests run on ROS-less hosts: the
package manifest is checked structurally and the node script is driven
end-to-end against fake rospy/geometry_msgs/sensor_msgs modules injected
into sys.modules.
"""
import os
import subprocess
import sys
import types
import xml.etree.ElementTree as ET
import importlib.util
from importlib.machinery import SourceFileLoader

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "ros_ws", "src", "continuum_tpu")
NODE = os.path.join(PKG, "src", "motor_joy_teleop")


def test_package_manifest_is_valid():
    root = ET.parse(os.path.join(PKG, "package.xml")).getroot()
    assert root.tag == "package" and root.get("format") == "2"
    assert root.findtext("name") == "continuum_tpu"
    assert root.findtext("license")
    deps = {e.text for e in root if e.tag.endswith("depend")}
    # what the node actually imports (the reference under-declares:
    # motor_joy_teleop:4-5 uses geometry_msgs/sensor_msgs undeclared)
    for need in ("rospy", "std_msgs", "geometry_msgs", "sensor_msgs"):
        assert need in deps, f"package.xml missing <depend>{need}"


def test_launch_file_parses_and_eval_spans_whole_attribute():
    """roslaunch accepts $(eval ...) ONLY as the ENTIRE attribute value
    (mixing it with literal text raises SubstitutionException at parse
    time) — pin that every attribute using eval obeys the rule, and that
    the teleop node line forwards port/sil."""
    path = os.path.join(PKG, "launch", "teleop.launch")
    root = ET.parse(path).getroot()
    assert root.tag == "launch"
    for el in root.iter():
        for key, val in el.attrib.items():
            if "$(eval" in val:
                assert val.startswith("$(eval") and val.endswith(")"), (
                    f"<{el.tag} {key}> mixes $(eval) with literal text: "
                    f"{val!r} — roslaunch rejects this at parse time")
    nodes = {n.get("name"): n for n in root.findall("node")}
    assert "motor_joy_teleop" in nodes and "joy_node" in nodes
    args = nodes["motor_joy_teleop"].get("args")
    assert "--port" in args and "--sil" in args and "arg('port')" in args
    # the eval expression must be valid python given roslaunch's arg()
    expr = args[len("$(eval"):-1].strip()
    for sil in (True, False):
        out = eval(expr, {"arg": {"port": "/dev/ttyACM1",
                                  "sil": sil}.__getitem__})
        assert out.startswith("--port /dev/ttyACM1")
        assert ("--sil" in out) == sil


def test_cmakelists_installs_the_node():
    txt = open(os.path.join(PKG, "CMakeLists.txt")).read()
    assert "catkin_install_python" in txt
    assert "src/motor_joy_teleop" in txt
    assert "project(continuum_tpu)" in txt


def test_node_script_is_executable_and_rosless_safe():
    assert os.access(NODE, os.X_OK), "node must be chmod +x for rosrun"
    # --help must work with no ROS installed (imports stay lazy)
    r = subprocess.run([sys.executable, NODE, "--help"],
                       capture_output=True, text=True, timeout=60,
                       env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stderr
    assert "--sil" in r.stdout and "--port" in r.stdout


def _load_node(mod_name):
    """Import the extensionless node script as a module."""
    loader = SourceFileLoader(mod_name, NODE)
    spec = importlib.util.spec_from_loader(mod_name, loader)
    mod = importlib.util.module_from_spec(spec)
    loader.exec_module(mod)
    return mod


def _install_fake_ros(monkeypatch, shutdown_after=5):
    """Minimal rospy + msg modules satisfying make_ros_teleop's imports."""
    from test_hw import _FakeJoy, _FakeQuaternionStamped, _FakeRospy

    calls = {"n": 0, "rates": []}
    fake = _FakeRospy()
    rospy = types.ModuleType("rospy")
    rospy.Publisher = fake.Publisher
    rospy.Subscriber = fake.Subscriber
    rospy.loginfo = fake.loginfo
    rospy.logerr = fake.loginfo
    rospy.Time = type(fake).Time
    rospy.init_node = lambda name, anonymous=False: calls.__setitem__(
        "node_name", name)
    rospy.signal_shutdown = lambda reason: None

    def is_shutdown():
        calls["n"] += 1
        return calls["n"] > shutdown_after

    rospy.is_shutdown = is_shutdown

    class _Rate:
        def __init__(self, hz):
            calls["rates"].append(hz)

        def sleep(self):
            pass

    rospy.Rate = _Rate

    geo = types.ModuleType("geometry_msgs")
    geo_msg = types.ModuleType("geometry_msgs.msg")
    geo_msg.QuaternionStamped = _FakeQuaternionStamped
    geo.msg = geo_msg
    sens = types.ModuleType("sensor_msgs")
    sens_msg = types.ModuleType("sensor_msgs.msg")
    sens_msg.Joy = _FakeJoy
    sens.msg = sens_msg

    for name, mod in [("rospy", rospy), ("geometry_msgs", geo),
                      ("geometry_msgs.msg", geo_msg),
                      ("sensor_msgs", sens), ("sensor_msgs.msg", sens_msg)]:
        monkeypatch.setitem(sys.modules, name, mod)
    return fake, calls


def test_node_main_runs_sil_under_fake_ros(monkeypatch):
    """rosrun-equivalent smoke: load the node script, run main(['--sil'])
    against fake ROS modules — init_node name, 1 kHz default rate, topic
    wiring, and clean shutdown all match the reference node
    (motor_joy_teleop:17,151-156)."""
    fake, calls = _install_fake_ros(monkeypatch, shutdown_after=5)
    node_mod = _load_node("motor_joy_teleop_node")
    rc = node_mod.main(["--sil", "--rate", "250"])
    assert rc == 0
    assert calls["node_name"] == "motor_joy_teleop"
    assert calls["rates"] == [250.0]
    assert set(fake.publishers) == {"tension", "pwm"}
    assert "/joy" in fake.subscribers
    assert any("motor_joy_teleop has started" in m for m in fake.logs)


def test_node_main_without_ros_raises_helpfully(monkeypatch):
    for name in ("rospy", "geometry_msgs", "sensor_msgs"):
        monkeypatch.setitem(sys.modules, name, None)
    node_mod = _load_node("motor_joy_teleop_node2")
    with pytest.raises(ImportError, match="ROS 1 python environment"):
        node_mod.main(["--sil"])
