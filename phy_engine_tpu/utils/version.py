"""Version info (utils/version.h analogue)."""

import subprocess

__version__ = "0.1.0"


def version_string() -> str:
    try:
        h = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                           capture_output=True, text=True,
                           timeout=5).stdout.strip()
    except Exception:
        h = ""
    return f"phy_engine_tpu {__version__}" + (f" ({h})" if h else "")
