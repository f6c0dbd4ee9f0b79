// coffeebridge: harness-side driver added to the REPAIRED REFERENCE build
// (refbuild/) for cross-engine work against the TPU rebuild. Two roles:
//
//  1. "rawnn" lines: evaluate a position through the reference's own
//     NNEvaluator (Eigen backend) with a pinned symmetry and print the
//     POSTPROCESSED NNOutput as JSON — the ground truth for the rebuild's
//     ModelDesc importer parity tests (katacoffee_tpu/nn/refmodel.py).
//
//  2. "newgame/play/genmove" lines: a minimal move server over the
//     reference Search (search.h runWholeSearchAndGetMove), used by the
//     cross-engine strength match harness (tools/cross_match.py). GTP was
//     pruned from this build (fork's gtp.cpp does not compile); this is the
//     smallest protocol that drives the reference engine's full search.
//
// Protocol (stdin -> stdout, one response line per command):
//   rawnn <x> <y> <winlen> [x,y,d ...]   eval after moves (black first)
//   newgame <x> <y> <winlen> <seed>      fresh game + fresh Search(seed)
//   play <x> <y> <d>                     play move for side to move
//   genmove                              search + play; prints move + result
//   quit
//
// Build: added to refbuild CMakeLists (see refbuild_patches/BUILD.md).
#include "../core/global.h"
#include "../core/config_parser.h"
#include "../core/logger.h"
#include "../core/rand.h"
#include "../game/board.h"
#include "../game/boardhistory.h"
#include "../neuralnet/nneval.h"
#include "../neuralnet/nninputs.h"
#include "../program/setup.h"
#include "../search/search.h"
#include "../search/searchnode.h"
#include "../main.h"

#include <iostream>
#include <sstream>
#include <memory>

using namespace std;

static void printJsonFloatArray(ostream& out, const float* data, int n) {
  out << "[";
  for(int i = 0; i < n; i++) {
    if(i > 0) out << ",";
    out << data[i];
  }
  out << "]";
}

int MainCmds::coffeebridge(const vector<string>& args) {
  Board::initHash();
  ScoreValue::initTables();

  ConfigParser cfg;
  string modelFile;
  {
    KataGoCommandLine cmd("Coffee cross-engine bridge (rawnn + move server).");
    cmd.addConfigFileArg("", "bridge.cfg");
    cmd.addModelFileArg();
    cmd.setShortUsageArgLimit();
    cmd.addOverrideConfigArg();
    cmd.parseArgs(args);
    modelFile = cmd.getModelFile();
    cmd.getConfig(cfg);
  }

  Logger logger(&cfg, false, true);  // log to stderr only
  Rand seedRand;

  vector<SearchParams> paramss = Setup::loadParams(cfg, Setup::SETUP_FOR_MATCH);
  SearchParams params = paramss[0];

  const int maxConcurrentEvals = params.numThreads * 2 + 16;
  const int expectedConcurrentEvals = params.numThreads;
  const int defaultMaxBatchSize = std::max(8, ((params.numThreads + 3) / 4) * 4);

  int bx = cfg.contains("boardXSize") ? cfg.getInt("boardXSize") : Board::DEFAULT_LEN;
  int by = cfg.contains("boardYSize") ? cfg.getInt("boardYSize") : Board::DEFAULT_LEN;
  int bwin = cfg.contains("winLen") ? cfg.getInt("winLen") : Board::DEFAULT_WIN_LEN;

  NNEvaluator* nnEval = Setup::initializeNNEvaluator(
    modelFile, modelFile, /*expectedSha256=*/"", cfg, logger, seedRand,
    maxConcurrentEvals, expectedConcurrentEvals,
    bx, by, defaultMaxBatchSize,
    /*defaultRequireExactNNLen=*/true, /*disableFP16=*/true,
    Setup::SETUP_FOR_MATCH);

  unique_ptr<Search> search =
    make_unique<Search>(params, nnEval, &logger, "bridge-default");

  Board board(bx, by, bwin);
  Player pla = P_BLACK;
  BoardHistory hist(board, pla);

  string line;
  while(getline(cin, line)) {
    istringstream ss(line);
    string cmdTok;
    ss >> cmdTok;
    if(cmdTok == "quit")
      break;
    else if(cmdTok == "rawnn") {
      int x, y, winLen;
      ss >> x >> y >> winLen;
      Board b(x, y, winLen);
      Player p = P_BLACK;
      BoardHistory h(b, p);
      string mv;
      bool bad = false;
      while(ss >> mv) {
        int mx, my, md;
        if(sscanf(mv.c_str(), "%d,%d,%d", &mx, &my, &md) != 3) { bad = true; break; }
        Loc loc;
        loc.spot = Location::getSpot(mx, my, b.x_size);
        loc.dir = (Direction)md;
        if(!h.isLegal(b, loc, p)) { bad = true; break; }
        h.makeBoardMoveAssumeLegal(b, loc, p);
        p = getOpp(p);
      }
      if(bad) { cout << "{\"error\":\"bad or illegal move\"}" << endl; continue; }
      MiscNNInputParams nnInputParams;
      nnInputParams.symmetry = 0;  // pin identity so the JAX side can match
      NNResultBuf buf;
      nnEval->evaluate(b, h, p, nnInputParams, buf, /*skipCache=*/true,
                       /*includeOwnerMap=*/true);
      NNOutput* out = buf.result.get();
      int nnX = nnEval->getNNXLen();
      int nnY = nnEval->getNNYLen();
      int policySize = NUM_ACTUAL_DIRECTIONS * nnX * nnY;
      cout << "{\"policy\":";
      printJsonFloatArray(cout, out->policyProbs, policySize);
      cout << ",\"whiteWinProb\":" << out->whiteWinProb
           << ",\"whiteLossProb\":" << out->whiteLossProb
           << ",\"varTimeLeft\":" << out->varTimeLeft
           << ",\"shorttermWinlossError\":" << out->shorttermWinlossError
           << ",\"ownership\":";
      printJsonFloatArray(cout, out->whiteOwnerMap, nnX * nnY);
      cout << "}" << endl;
    }
    else if(cmdTok == "newgame") {
      int x, y, winLen;
      string seed;
      ss >> x >> y >> winLen >> seed;
      board = Board(x, y, winLen);
      pla = P_BLACK;
      hist = BoardHistory(board, pla);
      search = make_unique<Search>(params, nnEval, &logger, seed);
      cout << "= ok" << endl;
    }
    else if(cmdTok == "play") {
      int mx, my, md;
      ss >> mx >> my >> md;
      Loc loc;
      loc.spot = Location::getSpot(mx, my, board.x_size);
      loc.dir = (Direction)md;
      if(!hist.isLegal(board, loc, pla)) { cout << "? illegal" << endl; continue; }
      hist.makeBoardMoveAssumeLegal(board, loc, pla);
      pla = getOpp(pla);
      cout << "= " << (hist.isGameFinished ? "end" : "ok")
           << " " << (int)hist.winner << endl;
    }
    else if(cmdTok == "genmove") {
      if(hist.isGameFinished) { cout << "? finished" << endl; continue; }
      search->setPosition(pla, board, hist);
      Loc moveLoc = search->runWholeSearchAndGetMove(pla);
      int mx = Location::getX(moveLoc.spot, board.x_size);
      int my = Location::getY(moveLoc.spot, board.x_size);
      hist.makeBoardMoveAssumeLegal(board, moveLoc, pla);
      pla = getOpp(pla);
      cout << "= " << mx << " " << my << " " << (int)moveLoc.dir << " "
           << (hist.isGameFinished ? "end" : "ok") << " "
           << (int)hist.winner << endl;
    }
    else {
      cout << "? unknown" << endl;
    }
    cout.flush();
  }

  delete nnEval;
  return 0;
}
