// powdr-tpu native VM executor core.
//
// Counterpart of the reference's native preflight execution hot loop
// (/root/reference/openvm/src/powdr_extension/executor/mod.rs:457-600 and
// the interpreter pre-compute chains at :317-400): executes the program
// and emits one columnar record per retired instruction, which the python
// layer turns into chip witnesses.  The memory model matches
// powdr_tpu/vm/executor.py exactly: timestamped cells, registers in
// address space 1 (ptr = register index), RAM in address space 2
// (4-aligned word addresses), TS_DELTA ticks per instruction.
//
// Build: g++ -O2 -shared -fPIC -o libexec_core.so exec_core.cpp
#include <cstdint>
#include <cstring>
#include <deque>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint32_t MASK32 = 0xFFFFFFFFu;
constexpr int TS_DELTA = 8;

enum Opcode : int32_t {
  OP_ADD = 0, OP_SUB, OP_AND, OP_OR, OP_XOR, OP_SLL, OP_SRL, OP_SLT, OP_SLTU,
  OP_ADDI, OP_ANDI, OP_ORI, OP_XORI, OP_SLLI, OP_SRLI,
  OP_LUI,
  OP_LW, OP_SW,
  OP_BEQ, OP_BNE, OP_BLT, OP_BLTU,
  OP_JAL, OP_JALR,
  OP_MUL, OP_DIVU,
  OP_HALT,
  // rv32im completion (ids match powdr_tpu/vm/isa.py OPCODES order)
  OP_SRA, OP_SRAI, OP_SLTI, OP_SLTIU,
  OP_BGE, OP_BGEU,
  OP_REMU, OP_DIV, OP_REM,
  OP_MULH, OP_MULHU, OP_MULHSU,
  OP_LB, OP_LBU, OP_LH, OP_LHU, OP_SB, OP_SH,
  OP_AUIPC,
  // hints extension (vm/isa.py tail: revb, hintinv, hintsqrt, hintpop)
  OP_REVB, OP_HINTINV, OP_HINTSQRT, OP_HINTPOP,
};

struct Cell {
  uint64_t ts = 0;
  uint32_t val = 0;
  uint32_t init = 0;
  bool touched = false;
  int32_t created_epoch = 0;
};

struct Memory {
  // registers: flat (the vast majority of accesses); RAM: hash map.
  // 33 slots: x0-x31 plus the x32 discard register the ELF loader maps
  // architectural x0 writes to (vm/elf.py).
  Cell regs[33];
  std::unordered_map<uint32_t, Cell> ram;
  std::unordered_map<uint64_t, uint32_t> init_map;
  // segmentation: cells first touched in epoch k > 0 start refreshed at
  // ts = k*E (the host emits backfill refresh rows for epochs 1..k)
  int32_t cur_epoch = 0;
  uint64_t epoch_ticks = 0;  // E; 0 = segmentation off

  Cell& cell(uint32_t space, uint32_t ptr) {
    if (space == 1) {
      Cell& c = regs[ptr % 33];
      if (!c.touched && cur_epoch > 0) {
        c.created_epoch = cur_epoch;
        c.ts = (uint64_t)cur_epoch * epoch_ticks;
      }
      c.touched = true;
      return c;
    }
    auto it = ram.find(ptr);
    if (it != ram.end()) return it->second;
    Cell c;
    auto f = init_map.find(ptr);
    if (f != init_map.end()) c.val = f->second;
    c.init = c.val;
    c.touched = true;
    if (cur_epoch > 0) {
      c.created_epoch = cur_epoch;
      c.ts = (uint64_t)cur_epoch * epoch_ticks;
    }
    return ram.emplace(ptr, c).first->second;
  }
};

}  // namespace

// -- k256 field arithmetic for the hints extension ---------------------------
// p = 2^256 - 2^32 - 977; 4x64-bit limbs, little-endian.  The hint values
// are Montgomery-aware (R = 2^256): hintinv yields x^-1 * R^2 so that a
// Montgomery-form input maps to the Montgomery-form inverse; hintsqrt maps
// mont(a) to mont(sqrt(a)).  Mirrors vm/executor.py's python semantics.

struct U256 {
  uint64_t w[4];
};

static const uint64_t K256_C = 0x1000003D1ull;  // 2^32 + 977 = 2^256 - p

static const U256 K256_P = {{0xFFFFFFFEFFFFFC2Full, 0xFFFFFFFFFFFFFFFFull,
                             0xFFFFFFFFFFFFFFFFull, 0xFFFFFFFFFFFFFFFFull}};
// exponents / constants (computed from p; see vm/executor.py)
static const U256 K256_PM2 = {{0xFFFFFFFEFFFFFC2Dull, 0xFFFFFFFFFFFFFFFFull,
                               0xFFFFFFFFFFFFFFFFull, 0xFFFFFFFFFFFFFFFFull}};
static const U256 K256_SQRT_E = {{0xFFFFFFFFBFFFFF0Cull, 0xFFFFFFFFFFFFFFFFull,
                                  0xFFFFFFFFFFFFFFFFull, 0x3FFFFFFFFFFFFFFFull}};
static const U256 K256_R = {{0x00000001000003D1ull, 0, 0, 0}};  // 2^256 mod p
static const U256 K256_R2 = {{0x000007A2000E90A1ull, 0x1ull, 0, 0}};  // R^2 mod p
static const U256 K256_RINV = {{0xD838091D0868192Aull, 0xBCB223FEDC24A059ull,
                                0x9C46C2C295F2B761ull, 0xC9BD190515538399ull}};

static bool u256_is_zero(const U256& a) {
  return (a.w[0] | a.w[1] | a.w[2] | a.w[3]) == 0;
}

static int u256_cmp(const U256& a, const U256& b) {
  for (int i = 3; i >= 0; i--) {
    if (a.w[i] != b.w[i]) return a.w[i] < b.w[i] ? -1 : 1;
  }
  return 0;
}

static uint64_t u256_sub(U256& a, const U256& b) {  // a -= b, returns borrow
  unsigned __int128 br = 0;
  for (int i = 0; i < 4; i++) {
    unsigned __int128 d = (unsigned __int128)a.w[i] - b.w[i] - (uint64_t)br;
    a.w[i] = (uint64_t)d;
    br = (d >> 64) & 1;
  }
  return (uint64_t)br;
}

static void k256_reduce_once(U256& a) {
  if (u256_cmp(a, K256_P) >= 0) u256_sub(a, K256_P);
}

// a*b mod p via 512-bit product + folding 2^256 = c (c = 2^32 + 977)
static U256 k256_mul(const U256& a, const U256& b) {
  uint64_t lo[8] = {0};
  for (int i = 0; i < 4; i++) {
    unsigned __int128 carry = 0;
    for (int j = 0; j < 4; j++) {
      unsigned __int128 t =
          (unsigned __int128)a.w[i] * b.w[j] + lo[i + j] + (uint64_t)carry;
      lo[i + j] = (uint64_t)t;
      carry = t >> 64;
    }
    lo[i + 4] += (uint64_t)carry;
  }
  // fold hi*c into lo (hi = lo[4..8)): result < 2^256 + small
  uint64_t acc[5] = {lo[0], lo[1], lo[2], lo[3], 0};
  unsigned __int128 carry = 0;
  for (int i = 0; i < 4; i++) {
    unsigned __int128 t =
        (unsigned __int128)lo[4 + i] * K256_C + acc[i] + (uint64_t)carry;
    acc[i] = (uint64_t)t;
    carry = t >> 64;
  }
  acc[4] = (uint64_t)carry;
  // fold the one overflow limb again
  unsigned __int128 t = (unsigned __int128)acc[4] * K256_C + acc[0];
  U256 r;
  r.w[0] = (uint64_t)t;
  unsigned __int128 c2 = t >> 64;
  for (int i = 1; i < 4; i++) {
    unsigned __int128 u = (unsigned __int128)acc[i] + (uint64_t)c2;
    r.w[i] = (uint64_t)u;
    c2 = u >> 64;
  }
  if (c2) {  // one more wrap (adds c)
    unsigned __int128 u = (unsigned __int128)r.w[0] + K256_C;
    r.w[0] = (uint64_t)u;
    uint64_t cc = (uint64_t)(u >> 64);
    for (int i = 1; i < 4 && cc; i++) {
      unsigned __int128 v = (unsigned __int128)r.w[i] + cc;
      r.w[i] = (uint64_t)v;
      cc = (uint64_t)(v >> 64);
    }
  }
  k256_reduce_once(r);
  return r;
}

static U256 k256_pow(U256 base, const U256& e) {
  U256 result = {{1, 0, 0, 0}};
  for (int i = 0; i < 256; i++) {
    if ((e.w[i / 64] >> (i % 64)) & 1) result = k256_mul(result, base);
    base = k256_mul(base, base);
  }
  return result;
}

extern "C" {

// Record layout (columnar, one row per retired instruction):
//   op, pc, ts, rs1_val, rs2_val, rd_prev, mem_val, mem_prev,
//   prev_ts0..prev_ts3 (as many as the instruction's accesses, else 0)
// Returns number of retired instructions (including halt), or -1 on
// error (bad pc / unaligned address / step limit).
int64_t powdr_execute(
    // program: SoA arrays of length n_prog
    const int32_t* op, const int32_t* rd, const int32_t* rs1,
    const int32_t* rs2, const uint32_t* imm, int64_t n_prog,
    // initial RAM image
    const uint64_t* init_addr, const uint32_t* init_val, int64_t n_init,
    // limits
    int64_t max_steps,
    // outputs (preallocated, max_steps rows)
    int32_t* out_op, uint32_t* out_pc, uint64_t* out_ts,
    uint32_t* out_rs1val, uint32_t* out_rs2val, uint32_t* out_rdprev,
    uint32_t* out_memval, uint32_t* out_memprev, uint64_t* out_prevts /*4*max_steps*/,
    // final memory dump (preallocated cap rows); returns count via n_final
    uint64_t* fin_key, uint64_t* fin_ts, uint32_t* fin_val, uint32_t* fin_init,
    int64_t fin_cap, int64_t* n_final,
    // segmentation (epoch_steps instructions per segment; 0 = off).
    // mem refresh rows: (epoch, space<<32|ptr, value, prev_ts); exec
    // refresh rows: (epoch, pc, prev_ts).  See vm/system.py refresh chips.
    int64_t epoch_steps,
    int64_t* ref_seg, uint64_t* ref_key, uint32_t* ref_val, uint64_t* ref_prev_ts,
    int64_t ref_cap, int64_t* n_ref,
    int64_t* eref_seg, uint32_t* eref_pc, uint64_t* eref_prev_ts,
    int64_t eref_cap, int64_t* n_eref,
    // program counter space: program[i] sits at vaddr pc_base + 4*i;
    // execution starts at start_pc (ELF entry support)
    uint32_t pc_base, uint32_t start_pc) {
  Memory mem;
  mem.init_map.reserve(n_init * 2 + 16);
  for (int64_t i = 0; i < n_init; i++) mem.init_map[init_addr[i]] = init_val[i];
  uint64_t E = (uint64_t)epoch_steps * TS_DELTA;
  mem.epoch_ticks = E;
  int64_t nref = 0, neref = 0;

  uint32_t pc = start_pc;
  uint64_t ts = 1;
  int64_t steps = 0;
  bool halted = false;
  std::deque<uint32_t> hints;  // hints-extension phantom value queue

  while (steps < max_steps) {
    if (epoch_steps > 0 && steps > 0 && steps % epoch_steps == 0) {
      // epoch boundary b: hand execution + every touched cell across
      int64_t b = steps / epoch_steps;
      if (neref >= eref_cap) return -2;
      eref_seg[neref] = b;
      eref_pc[neref] = pc;
      eref_prev_ts[neref] = ts;
      neref++;
      ts = (uint64_t)b * E + 1;
      auto refresh = [&](uint64_t key, Cell& c) -> bool {
        if (nref >= ref_cap) return false;
        ref_seg[nref] = b;
        ref_key[nref] = key;
        ref_val[nref] = c.val;
        ref_prev_ts[nref] = c.ts;
        nref++;
        c.ts = (uint64_t)b * E;
        return true;
      };
      for (uint32_t r = 0; r < 33; r++)
        if (mem.regs[r].touched && !refresh((uint64_t(1) << 32) | r, mem.regs[r])) return -2;
      for (auto& kv : mem.ram)
        if (!refresh((uint64_t(2) << 32) | kv.first, kv.second)) return -2;
      mem.cur_epoch = (int32_t)b;
    }
    if (pc % 4 != 0 || pc < pc_base || (pc - pc_base) / 4 >= (uint64_t)n_prog)
      return -1;
    int64_t idx = (pc - pc_base) / 4;
    int32_t o = op[idx];
    out_op[steps] = o;
    out_pc[steps] = pc;
    out_ts[steps] = ts;
    out_rs1val[steps] = out_rs2val[steps] = out_rdprev[steps] = 0;
    out_memval[steps] = out_memprev[steps] = 0;
    uint64_t* pts = out_prevts + 4 * steps;
    pts[0] = pts[1] = pts[2] = pts[3] = 0;
    int k = 0;

    if (o == OP_HALT) {
      steps++;
      halted = true;
      break;
    }

    auto rd_reg = [&](uint32_t r) {
      Cell& c = mem.cell(1, r);
      pts[k] = c.ts;
      c.ts = ts + k;
      k++;
      return c.val;
    };
    auto wr_reg = [&](uint32_t r, uint32_t v) {
      Cell& c = mem.cell(1, r);
      pts[k] = c.ts;
      uint32_t prev = c.val;
      c.ts = ts + k;
      c.val = v;
      k++;
      return prev;
    };

    uint32_t next_pc = pc + 4;
    uint32_t im = imm[idx];
    uint32_t a, y, z;
    switch (o) {
      case OP_ADD: case OP_SUB: case OP_AND: case OP_OR: case OP_XOR:
      case OP_MUL: case OP_MULH: case OP_MULHU: case OP_MULHSU:
      case OP_SLTU: case OP_SLT:
      case OP_SLL: case OP_SRL: case OP_SRA:
      case OP_DIVU: case OP_REMU: case OP_DIV: case OP_REM: {
        a = rd_reg(rs1[idx]);
        y = rd_reg(rs2[idx]);
        out_rs1val[steps] = a;
        out_rs2val[steps] = y;
        int32_t sa = (int32_t)a, sy = (int32_t)y;
        uint32_t s = y & 31;
        switch (o) {
          case OP_ADD: z = a + y; break;
          case OP_SUB: z = a - y; break;
          case OP_AND: z = a & y; break;
          case OP_OR: z = a | y; break;
          case OP_XOR: z = a ^ y; break;
          case OP_MUL: z = (uint32_t)((uint64_t)a * y); break;
          case OP_MULH: z = (uint32_t)(((int64_t)sa * sy) >> 32); break;
          case OP_MULHU: z = (uint32_t)(((uint64_t)a * y) >> 32); break;
          case OP_MULHSU: z = (uint32_t)(((int64_t)sa * (uint64_t)y) >> 32); break;
          case OP_SLT: z = sa < sy ? 1 : 0; break;
          case OP_SLL: z = a << s; break;
          case OP_SRL: z = a >> s; break;
          case OP_SRA: z = (uint32_t)(sa >> s); break;
          case OP_DIVU: z = y ? a / y : MASK32; break;
          case OP_REMU: z = y ? a % y : a; break;
          case OP_DIV:
            if (y == 0) z = MASK32;
            else if (a == 0x80000000u && y == MASK32) z = a;  // overflow
            else z = (uint32_t)(sa / sy);
            break;
          case OP_REM:
            if (y == 0) z = a;
            else if (a == 0x80000000u && y == MASK32) z = 0;
            else z = (uint32_t)(sa % sy);
            break;
          default: z = a < y ? 1 : 0; break;
        }
        out_rdprev[steps] = wr_reg(rd[idx], z);
        break;
      }
      case OP_ADDI: case OP_ANDI: case OP_ORI: case OP_XORI:
      case OP_SLTI: case OP_SLTIU: {
        a = rd_reg(rs1[idx]);
        out_rs1val[steps] = a;
        switch (o) {
          case OP_ADDI: z = a + im; break;
          case OP_ANDI: z = a & im; break;
          case OP_ORI: z = a | im; break;
          case OP_SLTI: z = (int32_t)a < (int32_t)im ? 1 : 0; break;
          case OP_SLTIU: z = a < im ? 1 : 0; break;
          default: z = a ^ im; break;
        }
        out_rdprev[steps] = wr_reg(rd[idx], z);
        break;
      }
      case OP_SLLI: case OP_SRLI: case OP_SRAI: {
        a = rd_reg(rs1[idx]);
        out_rs1val[steps] = a;
        uint32_t s = im & 31;
        z = (o == OP_SLLI) ? (a << s)
            : (o == OP_SRLI) ? (a >> s)
                             : (uint32_t)((int32_t)a >> s);
        out_rdprev[steps] = wr_reg(rd[idx], z);
        break;
      }
      case OP_LUI:
        out_rdprev[steps] = wr_reg(rd[idx], im);
        break;
      case OP_AUIPC:
        out_rdprev[steps] = wr_reg(rd[idx], pc + im);
        break;
      case OP_LB: case OP_LBU: case OP_LH: case OP_LHU: {
        a = rd_reg(rs1[idx]);
        out_rs1val[steps] = a;
        uint32_t addr = a + im;
        uint32_t align = (o == OP_LH || o == OP_LHU) ? 2 : 1;
        if (addr % align != 0 || addr >= (1u << 30)) return -1;
        uint32_t off = addr & 3;
        Cell& c = mem.cell(2, addr - off);
        pts[k] = c.ts;
        c.ts = ts + k;
        k++;
        out_memval[steps] = c.val;
        uint32_t word = c.val;
        if (o == OP_LB || o == OP_LBU) {
          z = (word >> (8 * off)) & 0xFF;
          if (o == OP_LB && (z & 0x80)) z |= 0xFFFFFF00u;
        } else {
          z = (word >> (8 * off)) & 0xFFFF;
          if (o == OP_LH && (z & 0x8000)) z |= 0xFFFF0000u;
        }
        out_rdprev[steps] = wr_reg(rd[idx], z);
        break;
      }
      case OP_SB: case OP_SH: {
        a = rd_reg(rs1[idx]);
        y = rd_reg(rs2[idx]);
        out_rs1val[steps] = a;
        out_rs2val[steps] = y;
        uint32_t addr = a + im;
        uint32_t align = (o == OP_SH) ? 2 : 1;
        if (addr % align != 0 || addr >= (1u << 30)) return -1;
        uint32_t off = addr & 3;
        Cell& c = mem.cell(2, addr - off);
        pts[k] = c.ts;
        out_memprev[steps] = c.val;
        uint32_t nw;
        if (o == OP_SB)
          nw = (c.val & ~(0xFFu << (8 * off))) | ((y & 0xFF) << (8 * off));
        else
          nw = (c.val & ~(0xFFFFu << (8 * off))) | ((y & 0xFFFF) << (8 * off));
        c.ts = ts + k;
        c.val = nw;
        k++;
        break;
      }
      case OP_LW: {
        a = rd_reg(rs1[idx]);
        out_rs1val[steps] = a;
        uint32_t addr = a + im;
        if (addr % 4 != 0 || addr >= (1u << 30)) return -1;
        Cell& c = mem.cell(2, addr);
        pts[k] = c.ts;
        c.ts = ts + k;
        k++;
        out_memval[steps] = c.val;
        out_rdprev[steps] = wr_reg(rd[idx], c.val);
        break;
      }
      case OP_SW: {
        a = rd_reg(rs1[idx]);
        y = rd_reg(rs2[idx]);
        out_rs1val[steps] = a;
        out_rs2val[steps] = y;
        uint32_t addr = a + im;
        if (addr % 4 != 0 || addr >= (1u << 30)) return -1;
        Cell& c = mem.cell(2, addr);
        pts[k] = c.ts;
        out_memprev[steps] = c.val;
        c.ts = ts + k;
        c.val = y;
        k++;
        break;
      }
      case OP_BEQ: case OP_BNE: case OP_BLTU: case OP_BGEU:
      case OP_BLT: case OP_BGE: {
        a = rd_reg(rs1[idx]);
        y = rd_reg(rs2[idx]);
        out_rs1val[steps] = a;
        out_rs2val[steps] = y;
        bool taken;
        switch (o) {
          case OP_BEQ: taken = a == y; break;
          case OP_BNE: taken = a != y; break;
          case OP_BLTU: taken = a < y; break;
          case OP_BGEU: taken = a >= y; break;
          case OP_BLT: taken = (int32_t)a < (int32_t)y; break;
          default: taken = (int32_t)a >= (int32_t)y; break;
        }
        if (taken) next_pc = im;
        break;
      }
      case OP_JAL:
        out_rdprev[steps] = wr_reg(rd[idx], pc + 4);
        next_pc = im;
        break;
      case OP_JALR: {
        a = rd_reg(rs1[idx]);
        out_rs1val[steps] = a;
        out_rdprev[steps] = wr_reg(rd[idx], pc + 4);
        next_pc = a + im;
        break;
      }
      case OP_REVB: {
        a = rd_reg(rs1[idx]);
        out_rs1val[steps] = a;
        out_rdprev[steps] = wr_reg(rd[idx], __builtin_bswap32(a));
        break;
      }
      case OP_HINTINV: case OP_HINTSQRT: {
        // phantom: host-side read of 8 RAM words at the pointer in rs1;
        // the k256 field hint limbs go to the queue (no circuit access)
        uint32_t ptr = mem.cell(1, rs1[idx]).val;
        U256 x;
        for (int i = 0; i < 4; i++) {
          uint64_t lo = mem.cell(2, (ptr + 8 * i) & MASK32).val;
          uint64_t hi = mem.cell(2, (ptr + 8 * i + 4) & MASK32).val;
          x.w[i] = lo | (hi << 32);
        }
        k256_reduce_once(x);
        U256 v;
        if (o == OP_HINTINV) {
          if (u256_is_zero(x)) v = U256{{0, 0, 0, 0}};
          else v = k256_mul(k256_pow(x, K256_PM2), K256_R2);
        } else {
          U256 raw = k256_mul(x, K256_RINV);
          v = k256_mul(k256_pow(raw, K256_SQRT_E), K256_R);
        }
        for (int i = 0; i < 4; i++) {
          hints.push_back((uint32_t)v.w[i]);
          hints.push_back((uint32_t)(v.w[i] >> 32));
        }
        break;
      }
      case OP_HINTPOP: {
        if (hints.empty()) return -1;
        uint32_t v = hints.front();
        hints.pop_front();
        out_memval[steps] = v;  // hint value rides the mem_val column
        out_rdprev[steps] = wr_reg(rd[idx], v);
        break;
      }
      default:
        return -1;
    }
    pc = next_pc;
    ts += TS_DELTA;
    steps++;
  }
  if (!halted) return -1;

  // backfill refresh chains for cells first touched in epoch k > 0:
  // rows (m, cell, init, (m-1)*E) for m = 1..k keep the per-epoch refresh
  // set identical for every cell
  auto backfill = [&](uint64_t key, Cell& c) -> bool {
    for (int32_t m = 1; m <= c.created_epoch; m++) {
      if (nref >= ref_cap) return false;
      ref_seg[nref] = m;
      ref_key[nref] = key;
      ref_val[nref] = c.init;
      ref_prev_ts[nref] = (uint64_t)(m - 1) * E;
      nref++;
    }
    return true;
  };
  for (uint32_t r = 0; r < 33; r++)
    if (mem.regs[r].touched && !backfill((uint64_t(1) << 32) | r, mem.regs[r])) return -2;
  for (auto& kv : mem.ram)
    if (!backfill((uint64_t(2) << 32) | kv.first, kv.second)) return -2;
  *n_ref = nref;
  *n_eref = neref;

  // final memory dump
  int64_t nf = 0;
  for (uint32_t r = 0; r < 33; r++) {
    if (!mem.regs[r].touched) continue;
    if (nf >= fin_cap) return -1;
    fin_key[nf] = (uint64_t(1) << 32) | r;
    fin_ts[nf] = mem.regs[r].ts;
    fin_val[nf] = mem.regs[r].val;
    fin_init[nf] = mem.regs[r].init;
    nf++;
  }
  for (auto& kv : mem.ram) {
    if (nf >= fin_cap) return -1;
    fin_key[nf] = (uint64_t(2) << 32) | kv.first;
    fin_ts[nf] = kv.second.ts;
    fin_val[nf] = kv.second.val;
    fin_init[nf] = kv.second.init;
    nf++;
  }
  *n_final = nf;
  return steps;
}

}  // extern "C"
