"""Experiment orchestration: configs, g(T), evaluation, figures."""
