"""Extension surface + per-row invariants."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from jsonschema_validator_ray.constraints import compile_constraints, make_row_validator
from jsonschema_validator_ray.constraints.ir import RowConstraint
from jsonschema_validator_ray.constraints.kernels import KERNELS, kernel


def test_register_custom_kernel():
    """Adding a constraint kind = one registered kernel (the Validator-trait
    analog, reference src/types/validator.rs:5-19)."""
    @kernel("starts_with")
    def _k(c, col, is_null, batch, ir):
        prefix = c.params[0]
        ok = pc.starts_with(col, pattern=prefix)
        return pc.and_(pc.invert(ok), pc.invert(is_null))

    try:
        ir = compile_constraints({"columns": {}})
        ir.row_constraints.append(RowConstraint(
            cid="starts_with:conv_id", kind="starts_with", column="conv_id",
            params=("c",), message="Bad prefix"))
        batch = pa.table({"conv_id": pa.array(["c1", "x2", "c3"]),
                          "turn_idx": pa.array([0, 1, 2], pa.int32())})
        out = make_row_validator(ir)(batch)
        assert out["conv_id"].to_pylist() == ["x2"]
        assert out["message"].to_pylist() == ["Bad prefix"]
    finally:
        del KERNELS["starts_with"]


def test_text_never_mutated(ray_session, tmp_path):
    """Per-row invariant (BASELINE.json input_hint): the engine never mutates
    `text` — under stable (conv_id, turn_idx) ordering, input text before and
    after a validation run is byte-identical."""
    from jsonschema_validator_ray.pipelines import validate
    from jsonschema_validator_ray.sources import generate_transcripts

    gen = generate_transcripts(str(tmp_path / "t"), n_convs=60, n_files=2)
    before = pa.concat_tables([pq.read_table(f, columns=["conv_id", "turn_idx",
                                                         "text"])
                               for f in gen.files]) \
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    validate(gen.out_dir, spec={"columns": {"text": {"type": "string"}}})
    after = pa.concat_tables([pq.read_table(f, columns=["conv_id", "turn_idx",
                                                        "text"])
                              for f in gen.files]) \
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert before.equals(after)


def test_inspect_validator_hook():
    """Schema.inspect_validator — analog of the reference's test-only
    Schema::do_on_validator (src/types/schema.rs:80-88): runs the closure on
    the first validator of the requested keyword, or on None when absent."""
    from jsonschema_validator_ray.jsonvalidate import (KeywordType,
                                                       compile_schema)

    scope = compile_schema({"type": "string", "properties": {}})
    schema = scope.schema if hasattr(scope, "schema") else scope
    types = schema.inspect_validator(
        KeywordType.TYPE, lambda v: None if v is None else v.types)
    assert types == frozenset({"string"})
    assert schema.inspect_validator(KeywordType.REF, lambda v: v) is None
