"""Framework exceptions (parity: /root/reference/exceptions/exceptions.py:1-10)."""


class ConfigurationError(Exception):
    """Raised when the YAML config or CLI flag combination is invalid."""


class InitializationError(Exception):
    """Raised when a component is used before its prerequisites are ready."""
