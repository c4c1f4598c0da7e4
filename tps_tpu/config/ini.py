"""GRVY-compatible ini input parsing with typed getters.

Keeps the reference's input-file *schema* (sections like
[boundaryConditions/inlet1], keys with defaults/required semantics —
reference: src/tps.cpp:349-471) with a from-scratch Python parser.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class InputError(RuntimeError):
    pass


@dataclass
class IniInput:
    """Parsed ini file: flat map of 'section/key' -> raw string value."""

    values: dict = field(default_factory=dict)
    path: str | None = None

    @classmethod
    def parse(cls, text: str, path: str | None = None) -> "IniInput":
        values: dict[str, str] = {}
        section = ""
        for raw in text.splitlines():
            line = raw.strip()
            if not line or line.startswith(("#", ";")):
                continue
            if line.startswith("["):
                if not line.endswith("]"):
                    raise InputError(f"malformed section header: {raw!r}")
                section = line[1:-1].strip()
                continue
            if "=" not in line:
                raise InputError(f"malformed input line: {raw!r}")
            key, val = line.split("=", 1)
            # strip trailing comments (outside quotes)
            val = val.strip()
            out = []
            quote = None
            for ch in val:
                if quote:
                    out.append(ch)
                    if ch == quote:
                        quote = None
                elif ch in "'\"":
                    quote = ch
                    out.append(ch)
                elif ch in "#;":
                    break
                else:
                    out.append(ch)
            val = "".join(out).strip()
            full = f"{section}/{key.strip()}" if section else key.strip()
            values[full] = val
        return cls(values=values, path=path)

    @classmethod
    def read(cls, path: str) -> "IniInput":
        with open(path) as f:
            return cls.parse(f.read(), path=path)

    # ------------------------------------------------------------------
    def has(self, name: str) -> bool:
        return name in self.values

    def keys_under(self, prefix: str) -> list[str]:
        p = prefix.rstrip("/") + "/"
        return [k for k in self.values if k.startswith(p)]

    def sections_under(self, prefix: str) -> list[str]:
        """Distinct immediate sub-sections: 'boundaryConditions' ->
        ['inlet1', 'outlet1', ...]."""
        p = prefix.rstrip("/") + "/"
        subs = []
        for k in self.values:
            if k.startswith(p):
                rest = k[len(p) :]
                if "/" in rest:
                    s = rest.split("/", 1)[0]
                    if s not in subs:
                        subs.append(s)
        return subs

    @staticmethod
    def _convert(raw: str, typ):
        if typ is bool:
            v = raw.strip().strip("'\"").lower()
            if v in ("true", "1", "yes", "on"):
                return True
            if v in ("false", "0", "no", "off"):
                return False
            raise InputError(f"cannot parse bool from {raw!r}")
        if typ in (int, float):
            v = raw.strip().strip("'\"")
            if v.lower() in ("true", "false"):  # bool-ish ints (GRVY-compatible)
                return typ(v.lower() == "true")
            return typ(v)
        if typ is str:
            return raw.strip().strip("'\"")
        raise InputError(f"unsupported type {typ}")

    def get(self, name: str, default=None, typ=None):
        """getInput with default (type inferred from default if not given)."""
        if typ is None:
            if default is None:
                typ = str
            else:
                typ = type(default)
        if name not in self.values:
            return default
        return self._convert(self.values[name], typ)

    def get_required(self, name: str, typ=str):
        if name not in self.values:
            raise InputError(f"required input '{name}' not found"
                             + (f" in {self.path}" if self.path else ""))
        return self._convert(self.values[name], typ)

    def get_vec(self, name: str, n: int | None = None, typ=float, default=None):
        """Whitespace-separated vector, possibly quoted: uvw = '20 0 0'."""
        if name not in self.values:
            if default is not None:
                return list(default)
            raise InputError(f"required vector input '{name}' not found")
        parts = self.values[name].strip().strip("'\"").split()
        vals = [typ(p) for p in parts]
        if n is not None and len(vals) != n:
            raise InputError(f"input '{name}' expected {n} entries, got {len(vals)}")
        return vals

    def get_pairs(self, name: str):
        """Pairs 'a b' per whitespace grouping (getRequiredPairs analog)."""
        parts = self.values[name].strip().strip("'\"").split()
        if len(parts) % 2:
            raise InputError(f"input '{name}' has odd pair count")
        return [(parts[i], parts[i + 1]) for i in range(0, len(parts), 2)]
