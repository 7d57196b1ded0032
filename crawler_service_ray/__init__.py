"""crawler_service_ray — Ray-Data-native frontier crawl + data engine.

Library code NEVER calls ray.init()/ray.shutdown() (driver contract).

Ray worker processes resolve this package through the driver's working
directory or PYTHONPATH; exporting the package root here covers drivers
that import the package (from any cwd) before calling ray.init().
"""

import os as _os

_pkg_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_pp = _os.environ.get("PYTHONPATH", "")
if _pkg_root not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _pkg_root + (_os.pathsep + _pp if _pp else "")
    )
