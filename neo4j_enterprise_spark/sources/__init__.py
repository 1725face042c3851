"""Sources & sinks: snapshot backup/restore (S8), tx-log export (S9) and
replay (S10)."""
