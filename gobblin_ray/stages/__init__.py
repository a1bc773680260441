"""Per-record transform stages (Gobblin Converter / ForkOperator /
RowLevelPolicy analogs) as vectorized Ray Data batch transforms."""
