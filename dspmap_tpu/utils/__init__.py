"""Host-side utilities: synthetic scene simulation, replay, metrics, IO."""
