"""Per-system configurations (pattern: ref ferminet/configs/*)."""
