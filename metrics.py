#!/usr/bin/env python
"""metrics entry point — see gsjax/cli/metrics.py (reference: metrics.py)."""

from gsjax.cli.metrics import main

if __name__ == "__main__":
    main()
