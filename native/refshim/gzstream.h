// gzstream.h — empty shim: the reference includes it behind #ifdef GZSTREAM
// (newscan.hpp:34) and never uses it in the built configuration.
#pragma once
