"""Page-table sources: deterministic synthesis + IO."""
