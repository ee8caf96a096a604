"""Gaussian basis-set file reader (nwchem format).

Capability parity with the reference's arbitrary-basis pretraining: the
reference loads any pyscf-supported basis by name (ref ferminet/pretrain.py:
34-61, utils/scf.py:53-301) and its gen-1 tree parses nwchem basis files
directly (ref AIQMC/Gaussian_orbitals.py:11-26 over AIQMC/C.cc-pVDZ.nwchem).
pyscf is absent here, so this module parses nwchem-format files/strings into
the shell table consumed by utils/gto.build_basis, enabling cc-pVDZ-class
RHF/UHF pretraining targets from data files.

Accepted syntax (both the bare reference style and the BSE "BASIS ... END"
wrapper):

    # comment
    BASIS "ao basis" PRINT          <- optional wrapper, ignored
    C s
    13.073594  0.0051583
    ...
    C sp                            <- combined shell: coef_s coef_p columns
    1.478740   -0.2196  0.0105
    END

Shell letters s/p/d/f are supported (utils/gto evaluates any Cartesian
angular momentum via McMurchie-Davidson).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

Shell = Tuple[str, List[Tuple[float, float]]]


def parse_nwchem_basis(text: str) -> Dict[str, List[Shell]]:
    """Parses nwchem basis text -> {element symbol: [(shell, [(exp, coef)])]}."""
    shells: Dict[str, List[Shell]] = {}
    current: List[List] = []  # list of [symbol, shell_letter, prims]

    def flush():
        for symbol, letter, prims in current:
            shells.setdefault(symbol, []).append((letter, prims))
        current.clear()

    for raw in text.splitlines():
        line = raw.split("#")[0].strip()
        if not line:
            continue
        upper = line.upper()
        if upper.startswith("BASIS") or upper == "END":
            continue
        parts = line.split()
        is_header = (len(parts) == 2 and parts[1].isalpha()
                     and parts[1].lower() in ("s", "p", "d", "f", "sp"))
        if is_header:
            flush()
            symbol = parts[0].capitalize()
            letter = parts[1].lower()
            if letter == "sp":
                # Combined Pople shell: one exponent, two coefficient columns.
                current.append([symbol, "s", []])
                current.append([symbol, "p", []])
            else:
                current.append([symbol, letter, []])
        else:
            if not current:
                raise ValueError(f"Primitive line before any shell header: "
                                 f"{line!r}")
            values = [float(v.replace("D", "E").replace("d", "e"))
                      for v in parts]
            if len(values) != 1 + len(current):
                raise ValueError(
                    f"Expected exponent + {len(current)} coefficient(s), got "
                    f"{line!r}")
            exp = values[0]
            for entry, coef in zip(current, values[1:]):
                entry[2].append((exp, coef))
    flush()
    if not shells:
        raise ValueError("No basis shells found")
    return shells


def read_nwchem_basis(path: str) -> Dict[str, List[Shell]]:
    with open(path) as f:
        return parse_nwchem_basis(f.read())
