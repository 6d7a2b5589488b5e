"""Real-model-tier loaders: from-scratch readers/writers for public
heavyweight model formats, wired into the actor-pool stages behind
opt-in paths (the deterministic from-scratch scorers remain the
default and the oracle-checked path)."""
