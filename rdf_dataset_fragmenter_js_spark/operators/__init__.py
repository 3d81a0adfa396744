"""Per-quad operators: matchers (predicates), transformers (flatMap-style),
term templates and value modifiers — all as Column-expression / DataFrame
combinators so Catalyst fuses them into one plan.
"""
