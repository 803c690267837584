"""``python -m chemlab_tpu @params`` — CLI entry point."""

import sys

from .start_simulation import main

if __name__ == "__main__":
    sys.exit(main())
