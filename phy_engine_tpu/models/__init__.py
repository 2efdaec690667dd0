from .base import ModelDef, DeviceClass, UpdatePhase, MODEL_REGISTRY, register
from .linear import (RESISTANCE, CAPACITOR, INDUCTOR, VDC, VAC, IDC, IAC,
                     VCVS, VCCS, CCVS, CCCS, TRANSFORMER,
                     TRANSFORMER_CENTER_TAP, COUPLED_INDUCTORS, OP_AMP)
from .sources import SAWTOOTH, SQUARE, PULSE, TRIANGLE
from .nonlinear import (PN_JUNCTION, BJT_NPN, BJT_PNP, NMOSFET, PMOSFET,
                        FULL_BRIDGE_RECTIFIER)
from .controller import SWITCH, RELAY, COMPARATOR
from .digital_gates import (AND, OR, NOT, YES, XOR, XNOR, NAND, NOR, IMP,
                            NIMP, INPUT, OUTPUT, TRI_STATE, RESOLVE2,
                            CASE_EQ, IS_UNKNOWN, TICK_DELAY, SCHMITT_TRIGGER,
                            EIGHT_BIT_INPUT, EIGHT_BIT_DISPLAY,
                            D_FF, D_FF_ARSTN, D_LATCH, JK_FF, T_FF, T_BAR_FF,
                            HALF_ADDER, FULL_ADDER, HALF_SUBTRACTOR,
                            FULL_SUBTRACTOR, MUL2, COUNTER4,
                            RANDOM_GENERATOR4)
from .verilog_module import VERILOG_MODULE, make_verilog_module
from .bsim3 import (BSIM3V32_NMOS, BSIM3V32_PMOS, BSIM3V32_NMOS_RC,
                    BSIM3V32_PMOS_RC)

__all__ = [n for n in dir() if n.isupper()] + [
    "ModelDef", "DeviceClass", "UpdatePhase", "register",
]
