"""Small generic helpers (ref AIQMCrelease3/utils/utils.py)."""

from typing import Any, Callable, Sequence


def select_output(f: Callable[..., Sequence[Any]], argnum: int) -> Callable[..., Any]:
    """Returns a function that picks the ``argnum``-th output of ``f``."""

    def f_selected(*args, **kwargs):
        return f(*args, **kwargs)[argnum]

    return f_selected
