#!/usr/bin/env python
"""train entry point — see gsjax/cli/train.py (reference: train.py)."""

from gsjax.cli.train import main

if __name__ == "__main__":
    main()
