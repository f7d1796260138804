"""Command-line entry points (reference: train.py / render.py / metrics.py /
full_eval.py / convert.py)."""
