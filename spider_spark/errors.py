"""Engine error taxonomy (E3) — same observable names/messages as the
reference's (db/exceptions.py:4-68): Credentials/DatabaseNotFound/
TableNotFound/TableAlreadyExists/DatabaseError, plus the crawler's
IncorrectProxyFormatError (crawler/exceptions.py)."""

from __future__ import annotations


class EngineError(Exception):
    """Base engine error (reference DatabaseError analog)."""


class CredentialsError(EngineError):
    def __init__(self, detail: str = ""):
        super().__init__(f"Authentication failed{': ' + detail if detail else ''}")


class DatabaseNotFoundError(EngineError):
    def __init__(self, name: str):
        super().__init__(f"Database `{name}` does not exist")


class TableNotFoundError(EngineError):
    def __init__(self, name: str):
        super().__init__(f"Table `{name}` does not exist")


class TableAlreadyExistsError(EngineError):
    def __init__(self, name: str):
        super().__init__(f"Table `{name}` already exists")


class IncorrectProxyFormatError(EngineError):
    def __init__(self, proxy: str | None):
        super().__init__(f"Incorrect proxy format: {proxy}")
