"""Base-call contract enforcement.

Capability of the reference's `force_super_call` / `ForceBaseCallMeta`
(reference src/utils/super_call_wrapper.py:5-69): raise at runtime when a
subclass override forgets to call the base implementation.  The reference
tracked state in a class-level flag (with a comment admitting it should be a
ContextVar under concurrency, super_call_wrapper.py:7-9); this
implementation uses a ``ContextVar`` stack, so it is correct under threads
and nested calls.
"""

from __future__ import annotations

import contextvars
import functools

_call_stack: contextvars.ContextVar[tuple] = contextvars.ContextVar(
    "base_call_stack", default=()
)


def enforce_base_call(method):
    """Mark a base-class method as must-be-called-by-overrides."""
    marker = (method.__qualname__,)

    @functools.wraps(method)
    def base_wrapper(*args, **kwargs):
        seen = _call_stack.get()
        _call_stack.set(seen + marker)
        return method(*args, **kwargs)

    base_wrapper.__base_call_marker__ = method.__name__
    return base_wrapper


class BaseCallEnforcedMeta(type):
    """Wrap subclass overrides of @enforce_base_call methods so that
    skipping super() raises a TypeError after the override returns."""

    def __new__(mcs, name, bases, ns):
        cls = super().__new__(mcs, name, bases, ns)
        for attr, value in ns.items():
            if not callable(value):
                continue
            for base in cls.__mro__[1:]:
                base_fn = base.__dict__.get(attr)
                if base_fn is not None and hasattr(base_fn, "__base_call_marker__"):
                    setattr(cls, attr, mcs._checked(value, base_fn))
                    break
        return cls

    @staticmethod
    def _checked(override, base_fn):
        marker = base_fn.__qualname__

        @functools.wraps(override)
        def wrapper(*args, **kwargs):
            token = _call_stack.set(())
            try:
                out = override(*args, **kwargs)
                if marker not in _call_stack.get():
                    raise TypeError(
                        f"{override.__qualname__} overrides "
                        f"{marker} but never calls super().{base_fn.__base_call_marker__}()"
                    )
                return out
            finally:
                _call_stack.reset(token)

        return wrapper
