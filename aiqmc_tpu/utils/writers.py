"""CSV metrics writer (capability parity with ref AIQMCrelease3/utils/writers.py:7-40).

Adds append-mode support for checkpoint-resumed runs, which the reference lacks
(its writer always truncates on open).
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional, Sequence

from absl import logging


class Writer(contextlib.AbstractContextManager):
    """Context-managed CSV writer with a fixed schema."""

    def __init__(self,
                 name: str,
                 schema: Sequence[str],
                 directory: str = "logs/",
                 iteration_key: Optional[str] = "t",
                 log: bool = True,
                 append: bool = False):
        self._schema = list(schema)
        os.makedirs(directory, exist_ok=True)
        self._filename = os.path.join(directory, name + ".csv")
        self._iteration_key = iteration_key
        self._log = log
        self._append = append and os.path.exists(self._filename)

    @property
    def filename(self) -> str:
        return self._filename

    def __enter__(self) -> "Writer":
        mode = "a" if self._append else "w"
        self._file = open(self._filename, mode, encoding="UTF-8")
        if not self._append:
            header = list(self._schema)
            if self._iteration_key:
                header.insert(0, self._iteration_key)
            self._file.write(",".join(header) + "\n")
        return self

    def write(self, t: int, **data):
        for key in data:
            if key not in self._schema:
                raise ValueError(f"Not a recognized key for writer: {key}")
        row = [str(data.get(key, "")) for key in self._schema]
        if self._iteration_key:
            row.insert(0, str(t))
        self._file.write(",".join(row) + "\n")
        self._file.flush()
        if self._log:
            logging.info("Iteration %s: %s", t, data)

    def __exit__(self, exc_type, exc_val, exc_tb):
        self._file.close()


class NullWriter(contextlib.AbstractContextManager):
    """Writer-shaped no-op for non-chief hosts in multi-process runs.

    All processes execute the training loop (the jitted step and observable
    evaluations are collectives), but only process 0 may write to the shared
    save_path; the rest get this sink.
    """

    filename = os.devnull

    def __enter__(self) -> "NullWriter":
        return self

    def write(self, t: int, **data):
        del t, data

    def __exit__(self, exc_type, exc_val, exc_tb):
        return None
