"""Device-side ops: the XLA/Pallas compute path (reference layers L6/L7)."""
