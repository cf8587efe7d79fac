#!/usr/bin/env python3
"""One-time fixture conversion: parse the Sakila INSERT dump from the
reference (/root/reference/sql/sakila-data.sql) into parquet fixtures under
src/test/resources/sakila/, for the golden-output fidelity tests
(FIXTURES.md §1). Only the 10 tables on the query path are converted.

Usage: python3 tools/sakila_to_parquet.py
"""
import re

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/reference/sql/sakila-data.sql"
OUT = "src/test/resources/sakila"

# (table, [(col, type)...]) in dump VALUES order; geometry column in
# address is wrapped in /*!50705 ...*/ version comments and stripped.
TABLES = {
    "address": [("address_id", "i"), ("address", "s"), ("address2", "s"),
                ("district", "s"), ("city_id", "i"), ("postal_code", "s"),
                ("phone", "s"), ("last_update", "t")],
    "category": [("category_id", "i"), ("name", "s"), ("last_update", "t")],
    "city": [("city_id", "i"), ("city", "s"), ("country_id", "i"), ("last_update", "t")],
    "country": [("country_id", "i"), ("country", "s"), ("last_update", "t")],
    "customer": [("customer_id", "i"), ("store_id", "i"), ("first_name", "s"),
                 ("last_name", "s"), ("email", "s"), ("address_id", "i"),
                 ("active", "i"), ("create_date", "t"), ("last_update", "t")],
    "film": [("film_id", "i"), ("title", "s"), ("description", "s"),
             ("release_year", "i"), ("language_id", "i"),
             ("original_language_id", "i"), ("rental_duration", "i"),
             ("rental_rate", "d42"), ("length", "i"), ("replacement_cost", "d52"),
             ("rating", "s"), ("special_features", "s"), ("last_update", "t")],
    "film_category": [("film_id", "i"), ("category_id", "i"), ("last_update", "t")],
    "inventory": [("inventory_id", "i"), ("film_id", "i"), ("store_id", "i"),
                  ("last_update", "t")],
    "payment": [("payment_id", "i"), ("customer_id", "i"), ("staff_id", "i"),
                ("rental_id", "i"), ("amount", "d52"), ("payment_date", "t"),
                ("last_update", "t")],
    "rental": [("rental_id", "i"), ("rental_date", "t"), ("inventory_id", "i"),
               ("customer_id", "i"), ("return_date", "t"), ("staff_id", "i"),
               ("last_update", "t")],
    # The four stock-view-only tables (film_list/staff_list/sales_by_*/
    # actor_info). staff.picture is a hex BLOB literal — parsed as a bare
    # token and dropped (type "x"); nothing downstream reads it.
    "actor": [("actor_id", "i"), ("first_name", "s"), ("last_name", "s"),
              ("last_update", "t")],
    "film_actor": [("actor_id", "i"), ("film_id", "i"), ("last_update", "t")],
    "staff": [("staff_id", "i"), ("first_name", "s"), ("last_name", "s"),
              ("address_id", "i"), ("picture", "x"), ("email", "s"),
              ("store_id", "i"), ("active", "i"), ("username", "s"),
              ("password", "s"), ("last_update", "t")],
    "store": [("store_id", "i"), ("manager_staff_id", "i"),
              ("address_id", "i"), ("last_update", "t")],
}


def parse_tuples(text: str):
    """Parse `(v, 'str', NULL), (...)` value lists from a VALUES body."""
    rows, i, n = [], 0, len(text)
    while i < n:
        while i < n and text[i] != "(":
            i += 1
        if i >= n:
            break
        i += 1
        row, cur, in_str = [], [], False
        while i < n:
            c = text[i]
            if in_str:
                if c == "\\":            # MySQL backslash escape
                    nxt = text[i + 1]
                    cur.append({"n": "\n", "t": "\t", "r": "\r", "0": "\0"}.get(nxt, nxt))
                    i += 2
                    continue
                if c == "'":
                    if i + 1 < n and text[i + 1] == "'":  # '' escape
                        cur.append("'")
                        i += 2
                        continue
                    in_str = False
                    i += 1
                    continue
                cur.append(c)
                i += 1
                continue
            if c == "'":
                in_str = True
                cur.append("\0STR\0")    # marker: this value was quoted
                i += 1
            elif c == ",":
                row.append("".join(cur).strip())
                cur = []
                i += 1
            elif c == ")":
                row.append("".join(cur).strip())
                rows.append(row)
                i += 1
                break
            else:
                cur.append(c)
                i += 1
    return rows


def convert(raw: str, typ: str):
    quoted = raw.startswith("\0STR\0")
    val = raw.replace("\0STR\0", "")
    if not quoted and val.upper() == "NULL":
        return None
    if typ == "i":
        return int(val)
    if typ in ("d42", "d52"):
        from decimal import Decimal
        return Decimal(val)
    if typ == "t":
        from datetime import datetime
        return datetime.strptime(val, "%Y-%m-%d %H:%M:%S")
    return val


def arrow_type(typ: str):
    return {"i": pa.int32(), "s": pa.string(), "t": pa.timestamp("us"),
            "d42": pa.decimal128(4, 2), "d52": pa.decimal128(5, 2)}[typ]


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    text = open(SRC, encoding="utf-8").read()
    text = re.sub(r"/\*!\d+ .*?,\*/", "", text)  # strip geometry version comments
    for table, cols in TABLES.items():
        bodies = re.findall(
            rf"INSERT INTO `?{table}`? VALUES (.*?);\n", text, re.S)
        rows = [r for b in bodies for r in parse_tuples(b)]
        assert rows, f"no rows parsed for {table}"
        bad = [r for r in rows if len(r) != len(cols)]
        assert not bad, f"{table}: arity mismatch, e.g. {bad[0][:3]} len={len(bad[0])}"
        arrays, fields = [], []
        for ci, (name, typ) in enumerate(cols):
            if typ == "x":               # parsed for arity, not exported
                continue
            vals = [convert(r[ci], typ) for r in rows]
            arrays.append(pa.array(vals, type=arrow_type(typ)))
            fields.append(pa.field(name, arrow_type(typ)))
        pq.write_table(pa.Table.from_arrays(arrays, schema=pa.schema(fields)),
                       f"{OUT}/{table}.parquet")
        print(f"{table}: {len(rows)} rows")


if __name__ == "__main__":
    main()
