#!/usr/bin/env python
"""convert entry point — see gsjax/cli/convert.py (reference: convert.py)."""

from gsjax.cli.convert import main

if __name__ == "__main__":
    main()
