"""Comparison pipelines (reference src/eval_pipelines/): five standalone
reimplementations of published methods sharing common building blocks —
mccann LNBNN, tombari Hough3D correspondence grouping, aldoma global
hypothesis verification, zhou self-adaptive HGHV, and knopp (the PCL
ImplicitShapeModelEstimation port)."""
