"""Env registry (populated later this round)."""
registry = {}
def make(*a, **k): raise NotImplementedError
def make_batched(*a, **k): raise NotImplementedError
