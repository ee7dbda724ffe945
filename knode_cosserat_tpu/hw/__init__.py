from .bridge import (AutoTare, ExperimentGenerator, FirmwareCore,
                     SimulatedWinchPlant, build_library, run_control_loop)
from .teleop import JoyState, TeleopNode, VirtualFirmwareSerial
from .sil import (export_bag, export_csv_bundle, run_sil_experiment,
                  sil_pipeline)
