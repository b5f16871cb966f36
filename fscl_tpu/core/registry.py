"""Generic string-keyed registries.

Replaces the reference's scattered registry dicts (`Define.py:11-13`,
`lightning/systems/__init__.py:9-64`, `Parsers/__init__.py:18-58`,
`lightning/datamodules/__init__.py:6-50`) with one mechanism.
"""
from __future__ import annotations

from typing import Callable, Dict, Generic, Iterator, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, kind: str):
        self.kind = kind
        self._items: Dict[str, T] = {}

    def register(self, *names: str) -> Callable[[T], T]:
        def deco(obj: T) -> T:
            for name in names:
                if name in self._items:
                    raise KeyError(f"{self.kind} '{name}' already registered")
                self._items[name] = obj
            return obj
        return deco

    def add(self, name: str, obj: T) -> None:
        self._items[name] = obj

    def get(self, name: str) -> T:
        if name not in self._items:
            known = ", ".join(sorted(self._items))
            raise KeyError(f"Unknown {self.kind} '{name}'. Known: {known}")
        return self._items[name]

    def __contains__(self, name: str) -> bool:
        return name in self._items

    def __iter__(self) -> Iterator[str]:
        return iter(self._items)

    def keys(self):
        return self._items.keys()


SYSTEMS: Registry = Registry("system")
DATAMODULES: Registry = Registry("datamodule")
RAW_PARSERS: Registry = Registry("raw parser")
PREPROCESSORS: Registry = Registry("preprocessor")
