#!/usr/bin/env python3
"""Import shim: loads the reference annotator (read-only, /root/reference)
with lightweight stand-ins for its heavyweight deps (rdflib, chardet,
requests, fastapi) so its *behavior* can be sampled offline to produce
test oracles. No reference code is copied into the repo; this module only
imports it at tool-time to record input->output pairs.

The rdflib stand-in implements just enough Graph behavior for the unit
ontology lookups (qudt:symbol / qudt:ucumCode / rdf:type) used by
annotator.get_unit, backed by a line-oriented parse of qudt_unit.ttl.
"""
import re, sys, types, io, os

REF = "/root/reference"

# ---------------------------------------------------------------- locale
import locale as _locale
_locale.setlocale = lambda *a, **k: None  # de_DE locale absent in sandbox

# ---------------------------------------------------------------- rdflib
rdflib = types.ModuleType("rdflib")

class URIRef(str):
    pass

class BNode(str):
    _n = [0]
    def __new__(cls):
        cls._n[0] += 1
        return str.__new__(cls, f"_:b{cls._n[0]}")

class Literal:
    def __init__(self, value, datatype=None):
        self.value = value
        self.datatype = datatype
    def __eq__(self, o):
        return isinstance(o, Literal) and self.value == o.value and self.datatype == o.datatype
    def __hash__(self):
        return hash((self.value, self.datatype))
    def __str__(self):
        return str(self.value)

class Namespace(str):
    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return URIRef(self + name)
    def __getitem__(self, name):
        return URIRef(self + name)

class _NS:
    RDF = Namespace("http://www.w3.org/1999/02/22-rdf-syntax-ns#")
    RDFS = Namespace("http://www.w3.org/2000/01/rdf-schema#")
    XSD = Namespace("http://www.w3.org/2001/XMLSchema#")
    CSVW = Namespace("http://www.w3.org/ns/csvw#")
    DC = Namespace("http://purl.org/dc/elements/1.1/")
    PROV = Namespace("http://www.w3.org/ns/prov#")

QUDT = "http://qudt.org/schema/qudt/"
UNIT = "http://qudt.org/vocab/unit/"

class Graph:
    """Stores only the triples annotator.get_unit needs, in file order."""
    def __init__(self, base=None):
        self.sym = {}    # symbol literal -> [unit iri...] in file order
        self.ucum = {}   # ucum literal -> [unit iri...]
        self.types = {}  # unit iri -> first rdf:type in file
    def parse(self, path=None, format=None, data=None, **kw):
        cur = None
        with open(path, encoding="utf-8") as f:
            for line in f:
                s = line.rstrip("\n")
                if s.startswith("unit:") and " " not in s.strip():
                    cur = UNIT + s.strip()[5:]
                    continue
                if cur is None:
                    continue
                t = s.strip()
                m = re.match(r'^a qudt:(\S+) ;$', t)
                if m and cur not in self.types:
                    self.types[cur] = URIRef(QUDT + m.group(1))
                m = re.match(r'^qudt:symbol "(.*)" ;$', t)
                if m:
                    self.sym.setdefault(m.group(1), []).append(URIRef(cur))
                m = re.match(r'^qudt:ucumCode "(.*)"\^\^qudt:UCUMcs ;$', t)
                if m:
                    self.ucum.setdefault(m.group(1), []).append(URIRef(cur))
        return self
    def triples(self, pat):
        s, p, o = pat
        if p == URIRef(QUDT + "symbol"):
            for iri in self.sym.get(str(o), []):
                yield (iri, p, o)
        elif p == URIRef(QUDT + "ucumCode"):
            if getattr(o, "datatype", None) == URIRef(QUDT + "UCUMcs"):
                for iri in self.ucum.get(str(o), []):
                    yield (iri, p, o)
    def value(self, s, p):
        return self.types.get(str(s))

rdflib.Graph = Graph
rdflib.URIRef = URIRef
rdflib.Literal = Literal
rdflib.Namespace = Namespace
rdflib.BNode = BNode

ns_mod = types.ModuleType("rdflib.namespace")
for k in ("RDF", "RDFS", "XSD", "CSVW", "DC", "PROV"):
    setattr(ns_mod, k, getattr(_NS, k))
rdflib.namespace = ns_mod

plugins = types.ModuleType("rdflib.plugins")
sparql = types.ModuleType("rdflib.plugins.sparql")
sparql.prepareQuery = lambda *a, **k: None
plugins.sparql = sparql

coll = types.ModuleType("rdflib.collection")
coll.Collection = object
rdflib.collection = coll
util = types.ModuleType("rdflib.util")
util.guess_format = lambda p: "json-ld"
rdflib.util = util

sys.modules["rdflib"] = rdflib
sys.modules["rdflib.namespace"] = ns_mod
sys.modules["rdflib.plugins"] = plugins
sys.modules["rdflib.plugins.sparql"] = sparql
sys.modules["rdflib.collection"] = coll
sys.modules["rdflib.util"] = util

# -------------------------------------------------------------- chardet
chardet = types.ModuleType("chardet")
# Encodings the reference's chardet reported for its own fixtures (the
# goldens record them in dialect.encoding); utf-8 otherwise.
KNOWN_ENC = {
    "example.csv": "ISO-8859-1",
    "example2.csv": "utf-8",
    "example3.csv": "utf-8",
    "example4.csv": "utf-8",
    "example5.csv": "ISO-8859-1",
}
_current_name = [None]
def _detect(data):
    enc = KNOWN_ENC.get(_current_name[0], "utf-8")
    return {"encoding": enc}
chardet.detect = _detect
sys.modules["chardet"] = chardet

# -------------------------------------------------------------- requests
requests = types.ModuleType("requests")
requests.Session = lambda: None
requests.packages = types.SimpleNamespace(
    urllib3=types.SimpleNamespace(disable_warnings=lambda: None))
sys.modules["requests"] = requests

# -------------------------------------------------------------- fastapi
fastapi = types.ModuleType("fastapi")
class HTTPException(Exception):
    def __init__(self, status_code=None, detail=None):
        super().__init__(detail)
        self.status_code = status_code
fastapi.HTTPException = HTTPException
sys.modules["fastapi"] = fastapi

# -------------------------------------------------------------- import it
sys.path.insert(0, REF)
os.chdir(REF)  # QUDT_UNIT_URL is relative
import annotator  # noqa: E402


def annotate_file(name):
    """Run the reference annotate path on one fixture, return metadata dict."""
    _current_name[0] = name
    path = os.path.join(REF, name)
    if not os.path.exists(path):
        path = os.path.join(REF, "examples", name)
    ann = annotator.CSV_Annotator("file://" + path)
    # mirror app.py: file url -> @id becomes bare filename
    return ann.annotate()
