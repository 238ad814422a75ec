"""SFT / conversation data preparation: chat-template rendering and
conversation QC.

The post-pretraining half of a training-data pipeline works on
CONVERSATIONS — ``array<struct<role, content>>`` message lists — and
every training stack flattens them to text with a chat template
before tokenization (the public ChatML convention popularized by
OpenAI's cookbook and HuggingFace ``apply_chat_template``:
``<|im_start|>role\\ncontent<|im_end|>`` per message). The operators
here are the Spark-side prep for that stage:

- :func:`render_chat` — flatten a message array to the training
  string under a named template, pure Catalyst (``transform`` +
  ``array_join`` over a projection-bound message array — no UDF, no
  shuffle).
- :func:`conversation_qc` — the structural validity gate SFT sets
  need before rendering (HH-RLHF-style cleanups): roles from the
  allowed set, an optional system message only at position 0,
  user/assistant strictly alternating with user first, non-empty
  content, assistant-final. Emits per-rule flags + a first-failure
  ``qc_reason`` in fixed rule order, the same observable-gate
  discipline as the quality gates.

Engine-exactness: rendering is deterministic string concatenation;
QC flags are pure boolean/array algebra — both mirror verbatim into
DuckDB list ops (z66), hash-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "CHAT_TEMPLATES",
    "render_chat",
    "conversation_qc",
]

#: Registered template names; each shape is a fixed concatenation so
#: the DuckDB oracle reproduces it verbatim (z66).
CHAT_TEMPLATES = ("chatml", "plain")


def _render_one(template: str, m: Column) -> Column:
    if template == "chatml":
        return F.concat(
            F.lit("<|im_start|>"),
            m["role"],
            F.lit("\n"),
            m["content"],
            F.lit("<|im_end|>"),
        )
    return F.concat(m["role"], F.lit(": "), m["content"])


def render_chat(
    df: DataFrame,
    messages_col: str = "messages",
    template: str = "chatml",
    out_col: str = "text",
) -> DataFrame:
    """Flatten ``array<struct<role, content>>`` message lists into
    the training text under a named template:

    - ``"chatml"``: ``<|im_start|>role\\ncontent<|im_end|>`` per
      message, newline-joined — the public ChatML shape.
    - ``"plain"``: ``role: content`` per message, newline-joined —
      the human-readable audit form.

    NULL message arrays render NULL (kept observable for QC — see
    :func:`conversation_qc`, which flags them); empty arrays render
    the empty string. Pure Catalyst: the message array is bound as a
    projected attribute, then one ``transform`` + ``array_join`` —
    map-only, no UDF, so at 100 TB this adds nothing beyond the
    scan.
    """
    if template not in CHAT_TEMPLATES:
        raise ValueError(
            f"unknown template {template!r} (have: {CHAT_TEMPLATES})"
        )
    b = df.withColumn("_rc_m", F.col(messages_col))
    rendered = F.array_join(
        F.transform(F.col("_rc_m"), lambda m: _render_one(template, m)),
        "\n",
    )
    if out_col in df.columns:
        cols = [
            rendered.alias(c) if c == out_col else F.col(c)
            for c in df.columns
        ]
    else:
        cols = [F.col(c) for c in df.columns] + [rendered.alias(out_col)]
    return b.select(*cols)


#: QC rule order — ``qc_reason`` is the FIRST failing rule.
QC_RULES = (
    "no_messages",
    "bad_role",
    "empty_content",
    "misplaced_system",
    "not_alternating",
    "assistant_last",
)


def conversation_qc(
    df: DataFrame,
    messages_col: str = "messages",
    allowed_roles: tuple[str, ...] = ("system", "user", "assistant"),
) -> DataFrame:
    """Structural QC for SFT conversations — the validity gate run
    before rendering/tokenizing an instruction-tuning set (the
    cleanup every public SFT corpus documents: malformed role tags,
    empty turns, double-sends, truncated dialogues). Appends one
    BOOLEAN flag per rule plus ``qc_reason`` (first failing rule in
    :data:`QC_RULES` order, NULL when clean) and ``n_turns``:

    - ``no_messages`` — NULL or empty message array;
    - ``bad_role`` — any role outside ``allowed_roles``;
    - ``empty_content`` — any NULL/whitespace-only content;
    - ``misplaced_system`` — a ``system`` role anywhere but
      position 0;
    - ``not_alternating`` — after the optional leading system
      message, turns must go user, assistant, user, … (user first);
    - ``assistant_last`` — the final turn must be the assistant's
      (a trailing user turn has no training signal).

    All pure array algebra over one projection-bound message array
    (``exists`` / ``filter`` / position comparisons) — map-only,
    mirrored verbatim by the DuckDB oracle (z66).
    """
    b = df.withColumn("_qc_m", F.col(messages_col))
    m = F.col("_qc_m")
    n = F.size(m)
    no_messages = m.isNull() | (n == 0)
    roles = F.transform(m, lambda x: x["role"])
    bad_role = F.exists(
        roles, lambda r: r.isNull() | ~r.isin(*allowed_roles)
    )
    empty_content = F.exists(
        m, lambda x: x["content"].isNull() | (F.trim(x["content"]) == "")
    )
    # system allowed only at position 0: any system in the tail fails
    misplaced_system = F.exists(
        F.slice(roles, 2, F.greatest(n - 1, F.lit(0))),
        lambda r: r == "system",
    )
    # strip the optional leading system, then demand user/assistant
    # strict alternation starting at user
    body = F.when(
        F.element_at(roles, 1) == "system", F.slice(roles, 2, n - 1)
    ).otherwise(roles)
    expected = F.transform(
        body,
        lambda r, i: F.when(i % 2 == 0, F.lit("user")).otherwise(
            F.lit("assistant")
        ),
    )
    not_alternating = (F.size(body) == 0) | F.exists(
        F.zip_with(body, expected, lambda a, e: a != e),
        lambda x: x,
    )
    assistant_last = F.element_at(roles, -1) != F.lit("assistant")
    flags = [
        ("no_messages", no_messages),
        ("bad_role", bad_role),
        ("empty_content", empty_content),
        ("misplaced_system", misplaced_system),
        ("not_alternating", not_alternating),
        ("assistant_last", assistant_last),
    ]
    out = b.withColumn("n_turns", F.coalesce(n, F.lit(0)).cast("bigint"))
    for name, cond in flags:
        safe = F.coalesce(cond, F.lit(True))
        # once no_messages fires, later array rules are vacuous —
        # gate them so flags stay individually meaningful
        if name != "no_messages":
            safe = F.when(
                F.coalesce(no_messages, F.lit(True)), F.lit(False)
            ).otherwise(safe)
        out = out.withColumn(name, safe)
    # first failing rule in declared order: open when-clauses yield
    # NULL when false, coalesce picks the first hit
    out = out.withColumn(
        "qc_reason",
        F.coalesce(
            *[F.when(F.col(name), F.lit(name)) for name, _ in flags]
        ),
    )
    return out.withColumn(
        "qc_pass", F.col("qc_reason").isNull()
    ).drop("_qc_m")