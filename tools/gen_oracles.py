#!/usr/bin/env python3
"""Generate behavioral oracles from the reference (via refshim) into
src/test/resources/oracle/:
  - typeof.tsv     cell -> get_value_type tag
  - makeid.tsv     string -> make_id output
  - unit.tsv       token -> unit iri + rdf type ('' if none)
  - meta/<name>.json   full annotate() metadata for each fixture
Run:  python3 tools/gen_oracles.py
"""
import io, json, os, re, sys, base64

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
OUT = "/root/repo/src/test/resources/oracle"
os.makedirs(OUT + "/meta", exist_ok=True)

import refshim
from refshim import annotate_file, KNOWN_ENC
import annotator

FIXTURES = ["example.csv", "example2.csv", "example3.csv", "example4.csv",
            "example5.csv", "example6.csv", "example7.csv", "example8.csv"]

# ------------------------------------------------ collect candidate cells
cells = set()
for name in FIXTURES:
    path = os.path.join(refshim.REF, name)
    if not os.path.exists(path):
        path = os.path.join(refshim.REF, "examples", name)
    enc = KNOWN_ENC.get(name, "utf-8")
    if enc == "ISO-8859-1":
        enc = "latin-1"
    text = open(path, "rb").read().decode(enc)
    for line in io.StringIO(text):
        cells.add(line)
        for rx in annotator.SEPARATORS_REGEX:
            for part in re.split(rx, line):
                cells.add(part)
                cells.add(part.strip())
                cells.add(part.strip().strip('"'))
                for tok in part.split(" "):
                    cells.add(tok)
                    cells.add(tok.strip())

EDGE = [
    "", " ", "0", "00", "05", "007", "-25", "+17", "840749", "1_0", "0x1F",
    "0o17", "0b101", "1,23", "1.000,5", "78,494141", "6.8902e-005", "1e5",
    ".5", "5.", "(1,2)", "(1, 2)", "(1.2)", "-(1.2)", "( 1.2 )", "True",
    "False", "TRUE", "None", "nan", "NaN", "inf", "May", "Mai", "Otsu",
    "IP65", "1605F", "hello world", "a.b", "f(x)", "[1,2]", "1+2", "2022-08",
    "2022-8-15", "2022-08-15", "2023-09-13T13:20:37.518565", "20.02.2008",
    "18.7.2000", "22.07.2014 07:20:41", "24.08.2022.  11:55:02", "11:55:02",
    "11:55", "40.02.2008", "1 N/C", "V AC", "Stelle 10 DF 30s",
    "https://example.org/x", "http://a b.com/x", "file:///tmp/x",
    "https://a.org/1 https://a.org/2", "May 2020", "20/02/2008", "1.2.3",
    "190C_1000h_1", "'quoted'", '"dquoted"', "Prüfzeit", "Müße", "1j",
    "2_5", "0.0", "-0", "€5", "5€", "5%", "#", "1/2", "12:60", "25:00",
    "31.12.99", "32.01.2020", "0.1e10", "1E5", "  42  ", "\t7\n",
]
cells.update(EDGE)
cells = sorted(c for c in cells if len(c) < 400)

def enc_field(s):
    return base64.b64encode(s.encode("utf-8")).decode("ascii")

with open(OUT + "/typeof.tsv", "w") as f:
    for c in cells:
        tag = annotator.get_value_type(c)
        tag = tag[0] if tag else "TEXT"
        f.write(f"{enc_field(c)}\t{tag}\n")
print("typeof.tsv:", len(cells))

with open(OUT + "/makeid.tsv", "w") as f:
    n = 0
    for c in cells:
        if "\n" in c or "\r" in c:
            continue
        f.write(f"{enc_field(c)}\t{enc_field(annotator.make_id(c))}\n")
        n += 1
print("makeid.tsv:", n)

with open(OUT + "/unit.tsv", "w") as f:
    n = 0
    for c in cells:
        if "\n" in c or "\r" in c or len(c) > 60:
            continue
        u = annotator.get_unit(c)
        if u:
            d = u["qudt:unit"]
            f.write(f"{enc_field(c)}\t{d['@id']}\t{d['@type']}\n")
        else:
            f.write(f"{enc_field(c)}\t\t\n")
        n += 1
print("unit.tsv:", n)

for name in FIXTURES:
    meta = annotate_file(name)
    with open(f"{OUT}/meta/{name.rsplit('.',1)[0]}.json", "w") as f:
        json.dump(meta, f, indent=1, ensure_ascii=False)
    print("meta:", name, "notes:", len(meta.get("notes", [])),
          "tables:", len(meta.get("tables", [])))
