#!/usr/bin/env python3
"""Dump the reference's *mid-stage* structures per fixture so the Scala
engine's segmentation / pandas-equivalent parsing can be tested piecewise:

  src/test/resources/oracle/stages/<name>.json :
    { "encoding": ..., "parts": [ {start,end,sep,count,type,
        // for meta parts:
        "meta": {"params": [[param, row, [val or null, pytype]...], ...]},
        // for data parts:
        "table": {"header_rows": n, "columns": [[title,...]...],
                  "dtypes": [...], "cells": [[[render,pytype],...],...]} } ] }

  plus "stage2": per table, the reference /api/rdf re-read:
    parse_csv_from_url_to_list with the inferred dialect -> typed rows.
"""
import io, json, os, sys, math

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import refshim
from refshim import KNOWN_ENC
import annotator
import csvw_parser
import pandas as pd
import numpy as np

OUT = "/root/repo/src/test/resources/oracle/stages"
os.makedirs(OUT, exist_ok=True)

FIXTURES = ["example.csv", "example2.csv", "example3.csv", "example4.csv",
            "example5.csv", "example6.csv", "example7.csv", "example8.csv"]

def pyval(v):
    """(render, type-tag) for a pandas cell value."""
    if v is None:
        return ["None", "none"]
    if isinstance(v, float) and math.isnan(v):
        return ["nan", "nan"]
    if isinstance(v, (bool, np.bool_)):
        return [str(bool(v)), "bool"]
    if isinstance(v, (int, np.integer)):
        return [str(int(v)), "int"]
    if isinstance(v, (float, np.floating)):
        return [repr(float(v)), "float"]
    return [str(v), "str"]

MAX_ROWS = 80  # cap matrices; enough to pin behavior without 18k-row dumps

for name in FIXTURES:
    path = os.path.join(refshim.REF, name)
    if not os.path.exists(path):
        path = os.path.join(refshim.REF, "examples", name)
    refshim._current_name[0] = name
    ann = annotator.CSV_Annotator("file://" + path)
    doc = {"encoding": ann.encoding, "parts": [], "stage2": []}
    get_meta = ann._CSV_Annotator__get_data_meta_part
    get_table = ann._CSV_Annotator__get_data_table_part
    for key, p in ann.parts.items():
        ent = {"key": key, "start": p["start"], "end": p["end"],
               "sep": p["sep"], "count": p["count"], "type": p["type"]}
        if p["type"] == "meta":
            df = get_meta(ann.file_string, start=p["start"], end=p["end"],
                          col_count=p["count"] + 1, separator=p["sep"])
            params = []
            for parm, data in df.to_dict(orient="index").items():
                row = int(data["row"])
                vals = [pyval(data[c]) for c in df.columns if c != "row"]
                params.append([str(parm), row, vals])
            ent["meta"] = {"params": params[:MAX_ROWS]}
        else:
            nh, td = get_table(ann.file_string, start=p["start"], end=p["end"],
                               separator=p["sep"])
            cols = []
            for t in td.columns:
                cols.append([str(x) for x in t] if isinstance(t, tuple) else [str(t)])
            cells = [[pyval(td.iat[i, j]) for j in range(td.shape[1])]
                     for i in range(min(len(td), MAX_ROWS))]
            ent["table"] = {"header_rows": int(nh),
                            "columns": cols,
                            "dtypes": [str(d) for d in td.dtypes],
                            "nrows": int(len(td)),
                            "cells": cells}
        doc["parts"].append(ent)
    # stage 2 re-reads, per data table in document order
    meta = ann.annotate()
    for t in meta["tables"]:
        d = t["dialect"]
        ncols = len(t["tableSchema"]["columns"]) - 1
        lines = csvw_parser.parse_csv_from_url_to_list(
            "file://" + path, num_cols=ncols, delimiter=d["delimiter"],
            skiprows=d["skipRows"], num_header_rows=d["headerRowCount"],
            encoding=d["encoding"])
        doc["stage2"].append({
            "table_id": t["@id"], "ncols": ncols,
            "nrows": len(lines),
            "rows": [[pyval(c) for c in row] for row in lines[:MAX_ROWS]]})
    with open(f"{OUT}/{name.rsplit('.',1)[0]}.json", "w") as f:
        json.dump(doc, f, ensure_ascii=False, indent=0)
    print(name, "parts:", len(doc["parts"]), "stage2:", len(doc["stage2"]))
