"""Second-zkVM adapters: proof that the APC engine (solver + optimizer +
bus handlers) is zkVM-generic, not tied to the native VM's ISA.

Counterpart of /root/reference/sp1-benchmarks/ — the reference drives
`build::<Sp1ApcAdapter>` over SP1 instruction AIRs with an SP1 bus map;
here `adapters.sp1` drives the same optimize_machine pipeline over
SP1-shaped instruction machines with their own bus ids and byte-lookup
semantics."""
