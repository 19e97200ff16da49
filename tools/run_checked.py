"""Run any pixelsplat_tpu entry point under the runtime shape harness.

Counterpart of the reference's pervasive jaxtyping/beartype import hook
(/root/reference/src/main.py:16-19): every annotated function in the
package is shape-checked at call time (typeguard backs the checks;
beartype is not in this image). The hook must be installed before the
package is imported, hence this launcher:

    python tools/run_checked.py pixelsplat_tpu.main +experiment=re10k ...
"""

import runpy
import sys

from jaxtyping import install_import_hook

if __name__ == "__main__":
    module = sys.argv[1]
    sys.argv = [module] + sys.argv[2:]
    with install_import_hook("pixelsplat_tpu", "typeguard.typechecked"):
        runpy.run_module(module, run_name="__main__", alter_sys=True)
