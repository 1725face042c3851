"""Operators: the engine's verbs, each a pure DataFrame→DataFrame function.

Grouped by SURVEY.md §2 families: reads (S6/S7/P1/P4/T1/A4), validation
(J1–J11/W1/W2/A1/P6), rankings (O1/O2), diff (U2), traversal (T2/T3),
mutation (P2/§2.12 id assignment), plus the Spark-native pipeline additions
(dedup, similarity, text, multimodal).
"""
