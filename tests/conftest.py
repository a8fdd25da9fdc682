"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set flags before jax initializes, hence the env mutation at import
time (pytest imports conftest before test modules import jax).
"""

import os

# OKET_TPU_TESTS=1 leaves the real TPU backend registered so the
# device-marked tests (`pytest -m tpu`) can exercise Mosaic lowering paths
# the CPU interpreter cannot (e.g. ragged final Pallas blocks).
_ON_DEVICE = bool(os.environ.get("OKET_TPU_TESTS"))
if not _ON_DEVICE:
    os.environ["JAX_PLATFORMS"] = "cpu"  # override axon: tests run on a CPU mesh
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize force-registers the axon TPU backend before
# conftest runs, so the env var alone is not enough — pin the platform via
# jax.config before any backend initializes.
import jax  # noqa: E402

if not _ON_DEVICE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def toy_dataset_dir(tmp_path_factory):
    """A tiny open-KG dataset in the mapped-to-ids on-disk format, with
    mention alternatives (modelled on the toy fixture embedded in the
    reference at utils/map_open_dataset_to_ids.py:316-443)."""
    d = tmp_path_factory.mktemp("toyds")
    write_toy_dataset(str(d))
    return str(d)


def write_toy_dataset(d: str) -> None:
    # entity mentions: ids 2..9 ; relations: ids 2..5 ; tokens small vocabs
    entities = {
        "B O": 2, "Barack Obama": 3, "N Y": 4, "New York": 5,
        "A Merkel": 6, "Germany": 7, "Paris": 8, "France": 9,
    }
    relations = {"works in": 2, "lives in": 3, "leads": 4, "capital of": 5}
    ent_tokens = {"B": 4, "O": 5, "Barack": 6, "Obama": 7, "N": 8, "Y": 9,
                  "New": 10, "York": 11, "A": 12, "Merkel": 13, "Germany": 14,
                  "Paris": 15, "France": 16}
    rel_tokens = {"works": 4, "in": 5, "lives": 6, "leads": 7, "capital": 8, "of": 9}

    with open(f"{d}/entity_id_map.txt", "w") as f:
        f.write("# token\tid\tcount\t\n")
        for t, i in entities.items():
            f.write(f"{t}\t{i}\t5\n")
    with open(f"{d}/relation_id_map.txt", "w") as f:
        f.write("# token\tid\tcount\t\n")
        for t, i in relations.items():
            f.write(f"{t}\t{i}\t5\n")
    with open(f"{d}/entity_token_id_map.txt", "w") as f:
        f.write("# token\tid\tcount\t\n")
        for t, i in ent_tokens.items():
            f.write(f"{t}\t{i}\t3\n")
    with open(f"{d}/relation_token_id_map.txt", "w") as f:
        f.write("# token\tid\tcount\t\n")
        for t, i in rel_tokens.items():
            f.write(f"{t}\t{i}\t3\n")
    with open(f"{d}/entity_id_tokens_ids_map.txt", "w") as f:
        f.write("# entity id\ttokens\t\n")
        for t, i in entities.items():
            toks = " ".join(str(ent_tokens[w]) for w in t.split())
            f.write(f"{i}\t2 {toks} 3\n")
    with open(f"{d}/relation_id_tokens_ids_map.txt", "w") as f:
        f.write("# relation id\ttokens\t\n")
        for t, i in relations.items():
            toks = " ".join(str(rel_tokens[w]) for w in t.split())
            f.write(f"{i}\t2 {toks} 3\n")

    # 5-col triples: subj rel obj subj_alternatives obj_alternatives
    # ("B O" and "Barack Obama" are alternative mentions of the same entity;
    #  same for "N Y"/"New York")
    train = [
        (2, 2, 4, "2 3", "4 5"),
        (3, 3, 5, "2 3", "4 5"),
        (6, 4, 7, "6", "7"),
        (8, 5, 9, "8", "9"),
        (2, 3, 4, "2 3", "4 5"),
    ]
    valid = [
        (3, 2, 5, "2 3", "4 5"),
        (6, 3, 7, "6", "7"),
    ]
    test = [
        (2, 4, 7, "2 3", "7"),
    ]
    for name, rows in (("train.txt", train), ("valid.txt", valid), ("test.txt", test)):
        with open(f"{d}/{name}", "w") as f:
            for s, r, o, sm, om in rows:
                f.write(f"{s}\t{r}\t{o}\t{sm}\t{om}\n")
