"""``python -m mcmc_tpu <config>`` — see mcmc_tpu.cli."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
