"""SQL front door and plan-level utilities."""
