"""Command-line entry points: train.py, test.py."""
