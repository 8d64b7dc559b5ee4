#!/usr/bin/env python3
"""Generate a large synthetic CSV corpus for CLI throughput measurement.

Usage: python3 tools/gen_big_corpus.py <outdir> [n_persons] [n_meas]

Writes <outdir>/src_PERSON.csv, <outdir>/src_MEAS.csv and <outdir>/rules.json
(v2 dialect). Deterministic — no RNG."""
import json
import os
import sys

outdir = sys.argv[1]
n_persons = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
n_meas = int(sys.argv[3]) if len(sys.argv) > 3 else 3_000_000
os.makedirs(outdir, exist_ok=True)

sexes = ["M", "F", "U"]
with open(f"{outdir}/src_PERSON.csv", "w") as f:
    f.write("person_id,sex,dob\n")
    for i in range(n_persons):
        f.write(f"p{i},{sexes[i % 3]},19{10 + i % 80:02d}-0{1 + i % 9}-1{i % 9}\n")

with open(f"{outdir}/src_MEAS.csv", "w") as f:
    f.write("person_id,mdate,val\n")
    for i in range(n_meas):
        f.write(f"p{i % n_persons},20{i % 24:02d}-1{i % 2}-0{1 + i % 9},{i % 1000}.{i % 100:02d}\n")

rules = {
    "metadata": {"dataset": "bigcorpus"},
    "cdm": {
        "person": {"src_PERSON.csv": {
            "person_id_mapping": {"source_field": "person_id", "dest_field": "person_id"},
            "date_mapping": {"source_field": "dob", "dest_field": ["birth_datetime"]},
            "concept_mappings": {"sex": {
                "M": {"gender_concept_id": [8507], "gender_source_concept_id": [8507]},
                "F": {"gender_concept_id": [8532], "gender_source_concept_id": [8532]},
                "original_value": ["gender_source_value"]}}}},
        "measurement": {"src_MEAS.csv": {
            "person_id_mapping": {"source_field": "person_id", "dest_field": "person_id"},
            "date_mapping": {"source_field": "mdate", "dest_field": ["measurement_datetime"]},
            "concept_mappings": {"val": {
                "*": {"measurement_concept_id": [3025315],
                      "measurement_source_concept_id": [3025315]},
                "original_value": ["measurement_source_value", "value_as_number"]}}}},
    },
}
with open(f"{outdir}/rules.json", "w") as f:
    json.dump(rules, f, indent=1)
print(f"wrote {outdir}: {n_persons} persons, {n_meas} measurements")
